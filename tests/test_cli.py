"""CLI entry points that don't need their own Spark session (dump) plus
the distributed verify path, driven through main(argv)."""

import json

import pytest

from zseq import synth
from zseq import encode as zenc
from zseq.__main__ import main


@pytest.fixture(scope="module")
def enc_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "enc")
    df = synth.tokens_df_range(spark, 500, partitions=2)
    zenc.encode(df, out, partitions=2)
    return out


def test_dump_striped_debug_view(enc_dir, capsys):
    assert main(["dump", enc_dir, "--limit", "5"]) == 0
    view = json.loads(capsys.readouterr().out)
    assert view["rows"] > 0
    assert set(view["columns"]) == {"doc_id", "tokens", "n_tok", "source"}
    assert all(len(v) <= 5 for v in view["columns"].values())
    assert view["codecs"]  # per-column codec tags present
    assert view["schema"]["tokens"].startswith("list")


def test_dump_part_out_of_range(enc_dir, capsys):
    assert main(["dump", enc_dir, "--part", "99"]) == 1


def test_info(enc_dir, capsys):
    assert main(["info", enc_dir]) == 0
    view = json.loads(capsys.readouterr().out)
    assert view["format"] == "zseq/1"
    assert view["totals"]["rows"] == 500


def test_compact_epochs(spark, tmp_path, capsys):
    """Streaming epochs -> one compacted dataset with equal contents."""
    from zseq import decode as zdec
    from zseq.streaming import epoch_dir

    root = str(tmp_path / "stream")
    zenc.encode(synth.tokens_df_range(spark, 300, partitions=3),
                epoch_dir(root, 0), partitions=3)
    zenc.encode(synth.tokens_df_range(spark, 200, partitions=3),
                epoch_dir(root, 1), partitions=3)
    out = str(tmp_path / "compacted")
    assert main(["compact", root, out, "--partitions", "2"]) == 0
    view = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert view["rows"] == 500 and view["epochs_in"] == 2
    assert view["parts"] == 2
    assert zdec.decode(spark, out).count() == 500


def test_info_reports_per_column_bytes(enc_dir, capsys):
    assert main(["info", enc_dir]) == 0
    view = json.loads(capsys.readouterr().out)
    cb = view["col_bytes"]
    assert set(cb) == {"doc_id", "tokens", "n_tok", "source"}
    assert all(v > 0 for v in cb.values())
    # per-column bytes account for the whole body (blocks minus framing)
    assert sum(cb.values()) <= view["totals"]["enc_bytes"]


def test_verify_cli_handles_map_columns(spark, tmp_path):
    """The distributed verify must survive map-typed columns (Spark
    forbids set ops on maps; they compare as sorted entry lists)."""
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (2, {"c": 3}), (3, {})],
        "k long, m map<string,int>")
    src = str(tmp_path / "msrc")
    enc = str(tmp_path / "menc")
    df.write.mode("overwrite").parquet(src)
    zenc.encode(spark.read.parquet(src), enc, partitions=2)
    assert main(["verify", src, enc]) == 0
