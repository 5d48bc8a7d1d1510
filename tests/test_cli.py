"""CLI round-trip (python -m weather_etl_docker_airflow_project_spark) using the
canned fixture; reuses the test session via in-process main()."""

from __future__ import annotations

from weather_etl_docker_airflow_project_spark.__main__ import main


def test_cli_ingest_once_idempotent(spark, tmp_path, capsys):
    sink = str(tmp_path / "sink")
    assert main(["ingest-once", "--sink", sink, "--canned"]) == 0
    assert "appended 3 new rows" in capsys.readouterr().out
    assert main(["ingest-once", "--sink", sink, "--canned"]) == 0
    assert "appended 0 new rows" in capsys.readouterr().out
    assert spark.read.parquet(sink).count() == 3


def test_cli_land_stream_show(spark, tmp_path, capsys):
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    assert main(["land", "--landing", landing, "--canned"]) == 0
    assert main(
        ["stream", "--landing", landing, "--sink", sink,
         "--checkpoint", ckpt, "--available-now"]
    ) == 0
    assert main(["show", "--sink", sink]) == 0
    out = capsys.readouterr().out
    assert "Tunis" in out and "Mumbai" in out
