"""CLI surface tests: argparse contract + the driver-side generate-tileset
command (Spark commands are exercised by the spark-submit smoke in CI-as-docs;
see scripts/submit_job.py)."""

from __future__ import annotations

import json
import os

import pytest

from osm_data_3d_tiles_spark.cli import main


def test_generate_tileset(tmp_path, capsys):
    rc = main(["generate-tileset", "--out", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert os.path.exists(out["tileset"])
    with open(out["tileset"]) as f:
        root = json.load(f)
    assert root["root"]["refine"] == "ADD"
    assert os.path.isdir(tmp_path / "subtiles")


def test_generate_tileset_ecef(tmp_path, capsys):
    rc = main(["generate-tileset", "--out", str(tmp_path), "--mode", "ecef"])
    assert rc == 0
    with open(tmp_path / "tileset.json") as f:
        root = json.load(f)
    assert "region" in root["root"]["boundingVolume"]


def test_generate_tileset_custombox(tmp_path, capsys):
    rc = main(["generate-tileset", "--out", str(tmp_path), "--mode", "custombox"])
    assert rc == 0
    with open(tmp_path / "tileset.json") as f:
        root = json.load(f)
    assert "box" in root["root"]["boundingVolume"]


def test_atlas_command(tmp_path, capsys):
    out_png = str(tmp_path / "diffuse.png")
    rc = main(["atlas", "--out", out_png])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["bytes"] > 1000
    with open(out_png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_ingest_mvt_command(spark, tmp_path, capsys):
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "mvt")
    out_dir = str(tmp_path / "buildings_parquet")
    rc = main(["ingest-mvt", "--src", fixture, "--out", out_dir])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["buildings_written"] == 2
    got = spark.read.parquet(out_dir)
    assert sorted(r.osm_id for r in got.select("osm_id").collect()) == [900001, 900002]


def test_missing_subcommand_errors():
    with pytest.raises(SystemExit):
        main([])


def test_bad_mode_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["generate-tileset", "--out", str(tmp_path), "--mode", "nope"])


def test_compact_command(spark, tmp_path, capsys):
    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    spark.range(0, 5000).selectExpr("id", "id % 7 as v").repartition(16) \
        .write.parquet(src)
    rc = main(["compact", "--src", src, "--out", out, "--target-mb", "512",
               "--sort-by", "id"])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["files"] == 1
    assert spark.read.parquet(out).count() == 5000


def test_cluster_layout_command(spark, tmp_path, capsys):
    src = str(tmp_path / "cells_src")
    out = str(tmp_path / "cells_clustered")
    spark.range(0, 4000).selectExpr(
        "shiftleft(id % 8, 48) | id as cell", "id as doc_id"
    ).write.parquet(src)
    rc = main(["cluster-layout", "--src", src, "--out", out,
               "--cell-col", "cell", "--prefix-shift", "48"])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["rows"] == 4000
    import glob
    assert len(glob.glob(f"{out}/cell_prefix=*")) == 8


def test_sql_command(spark, capsys):
    rc = main(["sql", "--sf-dir", "/root/testdata/sf0.001",
               "--query",
               "SELECT lang, COUNT(*) AS n, "
               "SUM(token_count(text)) AS toks FROM documents GROUP BY lang"])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["rows"] and all("lang" in r and r["toks"] > 0 for r in got["rows"])


def test_sql_command_requires_exactly_one_source(capsys):
    assert main(["sql", "--sf-dir", "/root/testdata/sf0.001"]) == 2
    assert "exactly one of" in capsys.readouterr().err
