"""The brand→family example mapping used by the prefix-match operators
(filter_typed, fn_prefix_match) — one definition, plus its hand-written
SQL CASE mirror for the DuckDB oracles. Keep the two in sync: the
oracle-parity gate fails loudly if they drift.
"""

_BRAND_TYPES = {"Brand#1": "family-one", "Brand#3": "family-three"}

_BRAND_CASE = """
    CASE WHEN p_brand LIKE 'Brand#3%' THEN 'family-three'
         WHEN p_brand LIKE 'Brand#1%' THEN 'family-one'
    END
"""
