"""Driver-side ingest: HTTP download + ZIP extraction.

Mirrors the reference's download step (geonames.js:184-221): fetch
``allCountries.zip`` + the two admin-code TSVs from the GeoNames dump
server, extract ``allCountries.txt``. This is deliberately *not* a
Spark job — Spark reads storage, not HTTP; ingest lands files (or
Parquet) where the cluster can scan them. At real scale you would
land the dump once and convert to Parquet with
:func:`convert_to_parquet` so every later read is columnar, splittable
and prunable.

Network access is not assumed: all functions take explicit URLs/paths
and are exercised in tests against local files.
"""

from __future__ import annotations

import os
import shutil
import urllib.request
import zipfile

BASE_URL = "http://download.geonames.org/export/dump/"  # geonames.js:9
ALL_COUNTRIES_ZIP = "allCountries.zip"  # geonames.js:11
ADMIN_FILES = ["admin1CodesASCII.txt", "admin2Codes.txt"]  # geonames.js:13-22


def download_file(url: str, dest_path: str) -> str:
    """GET one file to disk (geonames.js:61-67)."""
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    with urllib.request.urlopen(url) as resp, open(dest_path, "wb") as out:
        shutil.copyfileobj(resp, out)
    return dest_path


def extract_member(zip_path: str, member: str, dest_dir: str) -> str:
    """Extract a single member from a zip (geonames.js:198-219 extracts
    only allCountries.txt, lazily iterating entries)."""
    with zipfile.ZipFile(zip_path) as zf:
        return zf.extract(member, dest_dir)


def download(dest_dir: str, base_url: str = BASE_URL) -> dict[str, str]:
    """Full download step (geonames.js:184-221): fetch the dump + admin
    dims serially, then unzip allCountries.txt."""
    paths: dict[str, str] = {}
    for filename in [ALL_COUNTRIES_ZIP, *ADMIN_FILES]:
        paths[filename] = download_file(
            base_url + filename, os.path.join(dest_dir, filename)
        )
    txt = ALL_COUNTRIES_ZIP.replace("zip", "txt")  # geonames.js:206
    paths[txt] = extract_member(paths[ALL_COUNTRIES_ZIP], txt, dest_dir)
    return paths


def convert_to_parquet(spark, txt_dir: str, parquet_dir: str) -> None:
    """Land the TSV dump as Parquet — the engine's scale-path step the
    reference lacks. Downstream scans become columnar + prunable."""
    from etl_geonames_spark.sources.tsv import read_admin_codes, read_all_countries

    read_all_countries(spark, os.path.join(txt_dir, "allCountries.txt")) \
        .write.mode("overwrite").parquet(os.path.join(parquet_dir, "allcountries"))
    for f in ADMIN_FILES:
        read_admin_codes(spark, os.path.join(txt_dir, f)) \
            .write.mode("overwrite") \
            .parquet(os.path.join(parquet_dir, f.replace(".txt", "")))
