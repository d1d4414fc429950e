"""pgvector conversions (SURVEY A33-A35).

Reference:
- `vector` → Parquet LIST of REQUIRED FLOAT (postgres_cloner.rs:659;
  binary decoder datatypes/pgvector.rs:26-44). Text form: '[1,2,3]'.
- `halfvec` → f32 list by default (f16 values arrive pre-rounded from PG, so
  widening is exact); float16 logical-type mode is a storage annotation we
  cannot emit (documented deviation, values identical).
- `sparsevec` → Parquet MAP int→float with 1-BASED indices
  (postgres_cloner.rs:667-693; the +1 at :670). Text form already 1-based:
  '{1:-1,5:5.25}/5'. Empty map '{}' ≠ NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_vector(col: Column) -> Column:
    """'[1,2,3]' → array<float>. NULL → NULL; '[]' → empty array (≠ NULL)."""
    body = F.nullif(F.substring(col, 2, F.length(col) - 2), F.lit(""))
    arr = F.when(col.isNull(), F.lit(None)).when(
        body.isNull(), F.array().cast("array<float>")
    ).otherwise(F.transform(F.split(body, ","), lambda x: x.cast("float")))
    return arr


def parse_sparsevec(col: Column) -> Column:
    """'{i:v,…}/dim' → map<int,float> with the text's 1-based indices.

    Returns a struct {entries: map<int,float>, dim: int} so the dimension
    isn't lost; select `.entries` for reference-shape output.
    """
    entries_txt = F.regexp_extract(col, r"^\{(.*)\}/", 1)
    dim = F.regexp_extract(col, r"/(\d+)$", 1).cast("int")
    pairs = F.filter(F.split(entries_txt, ","), lambda p: p != "")
    entries = F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.split(p, ":")[0].cast("int").alias("key"),
                F.split(p, ":")[1].cast("float").alias("value"),
            ),
        )
    )
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.struct(entries.alias("entries"), dim.alias("dim"))
    )
