"""The ``python -m go_zoom_kinesis_spark`` console surface: list /
oracle / unknown-name handling in-process (no subprocess JVM spins),
plus one real run through the shared test session."""

from __future__ import annotations

import pytest

from go_zoom_kinesis_spark.__main__ import main


def test_cli_list_and_grep(capsys):
    main(["list", "--grep", "skyline"])
    out = capsys.readouterr().out.split()
    assert out == ["skyline_parts_2d"]
    main(["list"])
    assert len(capsys.readouterr().out.split()) >= 150


def test_cli_oracle_prints_sql(capsys):
    main(["oracle", "compaction_plan"])
    assert "GROUP BY source, bin_id" in capsys.readouterr().out


def test_cli_unknown_name_suggests_and_exits_2(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["run", "skyline_parts2d"])
    assert exc.value.code == 2
    assert "skyline_parts_2d" in capsys.readouterr().err


def test_cli_run_table_output(spark, sf_dir, capsys):
    # get_spark() inside main reuses the active test session
    main(["run", "string_agg_regions", "--sf", sf_dir, "--limit", "3"])
    out = capsys.readouterr().out
    assert "+" in out and "|" in out  # show()-style table rendered
