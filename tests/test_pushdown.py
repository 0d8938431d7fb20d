"""Projection + predicate pushdown into the .zseq reader: column skipping
via chunk-length prefixes, block pruning via zone maps."""

import numpy as np
import pyarrow as pa
import pytest

from zseq import synth, zseqfile
from zseq.zseqfile import ZseqReader


@pytest.fixture(scope="module")
def blob():
    tbl = synth.tokens_table_arrow(4000)
    # multiple blocks so pruning has something to skip
    return zseqfile.encode_table(
        tbl.to_batches(max_chunksize=500), schema=tbl.schema), tbl


def test_projection_only_selected_columns(blob):
    buf, tbl = blob
    out = zseqfile.decode_table(buf, columns=["doc_id", "n_tok"])
    assert out.column_names == ["doc_id", "n_tok"]
    assert out.column("doc_id").to_pylist() == \
        tbl.column("doc_id").to_pylist()
    assert out.column("n_tok").to_pylist() == tbl.column("n_tok").to_pylist()


def test_projection_unknown_column_raises(blob):
    buf, _ = blob
    with pytest.raises(KeyError):
        zseqfile.decode_table(buf, columns=["nope"])


def test_predicate_prunes_blocks(blob):
    buf, tbl = blob
    r = ZseqReader(buf)
    # heavy rows (n_tok == 2048) exist in roughly 1/97 of rows; blocks of
    # 500 rows nearly all contain one, so prune on an impossible range:
    out = pa.Table.from_batches(
        list(r.batches(predicate=[("n_tok", ">", 5000)])),
        schema=r.schema)
    assert out.num_rows == 0
    assert r.blocks_skipped == 8
    assert r.blocks_read == 0


def test_predicate_superset_semantics(blob):
    buf, tbl = blob
    r = ZseqReader(buf)
    got = pa.Table.from_batches(
        list(r.batches(predicate=[("n_tok", "=", 2048)])), schema=r.schema)
    # block-level pruning returns a superset of matching rows...
    want_ids = {
        d for d, n in zip(tbl.column("doc_id").to_pylist(),
                          tbl.column("n_tok").to_pylist()) if n == 2048
    }
    got_ids = set(got.column("doc_id").to_pylist())
    matching = {
        d for d, n in zip(got.column("doc_id").to_pylist(),
                          got.column("n_tok").to_pylist()) if n == 2048
    }
    assert matching == want_ids
    assert want_ids <= got_ids


def test_predicate_skips_with_sorted_data():
    # Sorted column -> tight zone maps -> most blocks pruned.
    ids = pa.table({
        "k": pa.array(np.arange(10000, dtype=np.int64)),
        "v": pa.array(np.arange(10000, dtype=np.int64) * 3),
    })
    buf = zseqfile.encode_table(ids.to_batches(max_chunksize=1000),
                                schema=ids.schema)
    r = ZseqReader(buf)
    out = pa.Table.from_batches(
        list(r.batches(predicate=[("k", ">=", 9000)])), schema=r.schema)
    assert r.blocks_skipped == 9
    assert r.blocks_read == 1
    assert set(out.column("k").to_pylist()) == set(range(9000, 10000))


def test_projection_and_predicate_compose(blob):
    buf, _ = blob
    r = ZseqReader(buf)
    out = pa.Table.from_batches(
        list(r.batches(columns=["source"],
                       predicate=[("n_tok", ">", 2000)])),
        schema=pa.schema([r.schema.field("source")]))
    assert out.column_names == ["source"]
    assert out.num_rows > 0


def test_spark_decode_pushdown(spark, tmp_path):
    from zseq import decode as zdec
    from zseq import encode as zenc

    df = synth.tokens_df_range(spark, 2000, partitions=2)
    out = str(tmp_path / "pd")
    zenc.encode(df, out, partitions=2)
    cols = zdec.decode(spark, out, columns=["doc_id", "n_tok"])
    assert cols.columns == ["doc_id", "n_tok"]
    assert cols.count() == 2000
    heavy = zdec.decode(
        spark, out, predicate=[("n_tok", "=", 2048)]
    ).filter("n_tok = 2048")
    want = df.filter("n_tok = 2048").count()
    assert heavy.count() == want
