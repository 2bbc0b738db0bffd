#!/usr/bin/env node
/**
 * Single-threaded JS stand-in for the reference's execution model, used
 * ONLY as a throughput baseline (the real reference's npm deps aren't
 * installable offline). Written from the documented semantics in
 * SURVEY.md §3 — plain loops, zero dependencies; deliberately NOT a
 * copy of the reference's Highland/Ramda implementation, but the same
 * work per row: TSV parse → any-of-equality filter → longest-prefix
 * type → PIT object build → composite-key admin2/admin1 probe with
 * self-parent fallback → JSON.stringify both outputs.
 *
 * Usage: node reference_sim.js <dir-with-allCountries.txt> [outFile]
 */
"use strict";
const fs = require("fs");
const path = require("path");

const dir = process.argv[2];
const outFile = process.argv[3] || "/dev/null";

const COLS = [
  "geonameid", "name", "asciiname", "alternatenames", "latitude",
  "longitude", "featureClass", "featureCode", "countryCode", "cc2",
  "admin1Code", "admin2Code", "admin3Code", "admin4Code", "population",
  "elevation", "dem", "timezone", "modificationDate",
];
const TYPES = { PPL: "hg:Place", ADM: "hg:Admin" };
const FILTERS = [{ countryCode: "NL" }, { countryCode: "DE" }];
const BASE = "http://sws.geonames.org/";

function loadAdmin(file) {
  const map = Object.create(null);
  for (const line of fs.readFileSync(file, "utf8").split("\n")) {
    if (!line) continue;
    const parts = line.split("\t");
    map[parts[0]] = { code: parts[0], geonameid: parts[3] };
  }
  return map;
}

const admin1 = loadAdmin(path.join(dir, "admin1CodesASCII.txt"));
const admin2 = loadAdmin(path.join(dir, "admin2Codes.txt"));

const t0 = process.hrtime.bigint();
// stream line-by-line (the reference's Highland pipeline streams too;
// a whole-file read also breaks node's 512 MB string cap at 4M rows)
const readline = require("readline");
const rl = readline.createInterface({
  input: fs.createReadStream(path.join(dir, "allCountries.txt")),
  crlfDelay: Infinity,
});
const out = fs.createWriteStream(outFile);
let pits = 0, rels = 0, rows = 0;

rl.on("line", (line) => {
  if (!line) return;
  rows++;
  const vals = line.split("\t");
  const row = {};
  for (let i = 0; i < COLS.length; i++) row[COLS[i]] = vals[i];

  let pass = false;
  for (const f of FILTERS) {
    let all = true;
    for (const k in f) if (row[k] !== f[k]) { all = false; break; }
    if (all) { pass = true; break; }
  }
  if (!pass) return;

  let code = row.featureCode, type;
  while (code.length) {
    type = TYPES[code];
    if (type) break;
    code = code.slice(0, -1);
  }
  if (!type) return;

  const pit = {
    uri: BASE + row.geonameid,
    name: row.name,
    type,
    geometry: {
      type: "Point",
      coordinates: [parseFloat(row.longitude), parseFloat(row.latitude)],
    },
    data: {
      featureClass: row.featureClass, featureCode: row.featureCode,
      countryCode: row.countryCode, cc2: row.cc2,
      admin1Code: row.admin1Code, admin2Code: row.admin2Code,
      admin3Code: row.admin3Code, admin4Code: row.admin4Code,
    },
  };
  out.write(JSON.stringify({ type: "pit", obj: pit }) + "\n");
  pits++;

  const codes = [row.countryCode, row.admin1Code, row.admin2Code,
                 row.admin3Code, row.admin4Code].filter((x) => x);
  if (codes.length === 3) {
    let parent = admin2[codes.join(".")];
    if (parent && parent.geonameid === row.geonameid) {
      parent = admin1[codes.slice(0, 2).join(".")];
    }
    if (parent) {
      out.write(JSON.stringify({
        type: "relation",
        obj: { from: BASE + row.geonameid, to: BASE + parent.geonameid, type: "hg:liesIn" },
      }) + "\n");
      rels++;
    }
  }
});

rl.on("close", () => {
  out.end(() => {
    const sec = Number(process.hrtime.bigint() - t0) / 1e9;
    console.log(JSON.stringify({
      engine: "reference-sim-node", rows, pits, relations: rels,
      sec: Math.round(sec * 100) / 100,
      rows_per_sec: Math.round(rows / sec),
    }));
  });
});
