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


def test_missing_subcommand_errors():
    with pytest.raises(SystemExit):
        main([])


def test_bad_mode_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["generate-tileset", "--out", str(tmp_path), "--mode", "nope"])
