"""Explicit StructType schemas + schema-contract validation.

The reference infers everything (pd.read_csv with no dtypes,
reference: app/preprocess_data.py:13) and defensively checks columns /
embedding dims ad hoc (app/main.py:136-138,152-153,
app/vector_search.py:49-51). Here schemas are explicit per table and
contract validation is a fail-fast helper (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------- testdata

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ------------------------------------------------------------- jobs fixture

# Raw job-post scan schema: 17 string columns (reference:
# app/EDA_proprocess.ipynb cells 0/2/5; FIXTURES.md F-1).
JOBS_RAW_COLUMNS = [
    "jobTitle",
    "companyName",
    "lid",
    "jobDescRaw",
    "finalZipcode",
    "finalState",
    "finalCity",
    "companyBranchName",
    "jobDescUrl",
    "nlpBenefits",
    "nlpSkills",
    "nlpSoftSkills",
    "nlpDegreeLevel",
    "nlpEmployment",
    "nlpSeniority",
    "correctDate",
    "scrapedLocation",
]
JOBS_RAW = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in JOBS_RAW_COLUMNS]
)

# Processed schema: 8 columns (reference: notebook cell 22; FIXTURES.md F-2).
JOBS_PROCESSED_COLUMNS = [
    "jobTitle",
    "companyName",
    "lid",
    "finalZipcode",
    "finalState",
    "finalCity",
    "correctDate",
    "jobDescClean",
]

# Flagship output schema (reference: app/main.py:258-262; FIXTURES.md F-4).
SIMILARITY_RESULT = T.StructType(
    [
        T.StructField("id1", T.StringType(), False),
        T.StructField("id2", T.StringType(), False),
        T.StructField("similarity", T.DoubleType(), False),
    ]
)


# ------------------------------------------------------------- validation


class SchemaContractError(ValueError):
    pass


def require_columns(df: DataFrame, columns: list[str], context: str = "") -> DataFrame:
    """Fail fast on missing columns.

    Spark analog of the reference's scattered ``if col in df.columns``
    guards (app/preprocess_data.py:26-95) and id/text checks
    (app/main.py:152-153) — but raising instead of silently skipping.
    """
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise SchemaContractError(
            f"missing columns {missing} {('in ' + context) if context else ''}; "
            f"have {df.columns}"
        )
    return df


def require_embedding_dim(df: DataFrame, column: str, dim: int) -> DataFrame:
    """Validate embedding dimensionality on a sample row.

    Analog of the reference's dimension checks (app/main.py:136-138,
    app/vector_search.py:49-51,152). Checks one row (cheap action);
    full-column enforcement belongs in the writer path.
    """
    require_columns(df, [column], "embedding table")
    row = df.select(column).first()
    if row is not None and row[0] is not None and len(row[0]) != dim:
        raise SchemaContractError(
            f"embedding dim mismatch: expected {dim}, found {len(row[0])}"
        )
    return df
