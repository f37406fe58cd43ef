"""Arrow-native batch UDF surface (``mapInArrow``) — the fourth UDF
flavor next to scalar/iterator pandas UDFs and Python UDTFs: batches
arrive as ``pyarrow.RecordBatch`` and never convert to pandas, so
ops that stay inside Arrow compute kernels skip the pandas
(de)serialization round-trip entirely.

The demo op (UTF-8 byte/char stats) HAS a pure-JVM twin
(octet_length/char_length — the production path, like the UDTF
chunker's JVM twin); the value here is the surface contract: zero-
copy Arrow in, Arrow out, vectorized kernels between.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def utf8_byte_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document byte vs character counts via Arrow compute
    kernels (``binary_length`` on the raw UTF-8 buffer,
    ``utf8_length`` on codepoints) — ``n_bytes - n_chars`` is the
    multibyte overhead, the storage-planning signal for non-ASCII
    corpora. NULL text rows are dropped. Pure mapInArrow: no pandas,
    no JVM expression — each batch is one vectorized kernel call.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_bytes", pa.int32()),
            pa.field("n_chars", pa.int32()),
        ]
    )

    def op(batches):
        for b in batches:
            tbl = pa.Table.from_batches([b])
            mask = pc.is_valid(tbl[text_col])
            tbl = tbl.filter(mask)
            txt = tbl[text_col]
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(tbl[id_col], pa.int64()).combine_chunks(),
                    pc.cast(pc.binary_length(pc.cast(txt, pa.binary())),
                            pa.int32()).combine_chunks(),
                    pc.cast(pc.utf8_length(txt), pa.int32())
                    .combine_chunks(),
                ],
                schema=schema,
            )

    return df.select(id_col, text_col).mapInArrow(
        op, f"{id_col} long, n_bytes int, n_chars int"
    )
