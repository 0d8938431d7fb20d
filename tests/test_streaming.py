"""Structured Streaming ingest: file source -> .zseq epochs -> union
decode; epoch replay is a committed no-op."""

import os

import pytest

from zseq import streaming, synth
from zseq.schema import TOKENS_SCHEMA


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "out", "ckpt")}


def _write_wave(spark, src: str, start: int, n: int) -> None:
    tbl = synth.tokens_table_arrow(n, start=start)
    import pyarrow.parquet as pq

    os.makedirs(src, exist_ok=True)
    pq.write_table(tbl, os.path.join(src, f"wave-{start}.parquet"))


def test_stream_encode_decode(spark, dirs):
    _write_wave(spark, dirs["src"], 0, 500)
    stream = (
        spark.readStream.schema(TOKENS_SCHEMA.to_spark())
        .parquet(dirs["src"])
    )
    q = streaming.encode_stream(stream, dirs["out"], dirs["ckpt"],
                                partitions=2)
    q.awaitTermination(120)
    assert len(streaming.committed_epochs(dirs["out"])) == 1

    # second wave -> new epoch, same checkpoint
    _write_wave(spark, dirs["src"], 500, 300)
    stream2 = (
        spark.readStream.schema(TOKENS_SCHEMA.to_spark())
        .parquet(dirs["src"])
    )
    q2 = streaming.encode_stream(stream2, dirs["out"], dirs["ckpt"],
                                 partitions=2)
    q2.awaitTermination(120)
    epochs = streaming.committed_epochs(dirs["out"])
    assert len(epochs) == 2

    back = streaming.decode_stream(spark, dirs["out"])
    assert back.count() == 800
    got = sorted(r.doc_id for r in back.select("doc_id").collect())
    assert got == sorted(f"doc_{i:08d}" for i in range(800))


def test_replayed_epoch_is_noop(spark, dirs):
    _write_wave(spark, dirs["src"], 0, 200)

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(TOKENS_SCHEMA.to_spark())
            .parquet(dirs["src"])
        )
        q = streaming.encode_stream(stream, dirs["out"], ckpt, partitions=2)
        q.awaitTermination(120)

    run(dirs["ckpt"])
    d = streaming.committed_epochs(dirs["out"])[0]
    before = os.path.getmtime(os.path.join(d, "manifest.json"))
    # Replay: a FRESH checkpoint restarts epoch numbering at 0 and
    # re-delivers the same data — the committed epoch must be a no-op.
    run(str(dirs["ckpt"]) + "_replay")
    assert len(streaming.committed_epochs(dirs["out"])) == 1
    after = os.path.getmtime(os.path.join(d, "manifest.json"))
    assert before == after
    assert streaming.decode_stream(spark, dirs["out"]).count() == 200
