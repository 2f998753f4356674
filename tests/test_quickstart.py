"""The examples/quickstart.py program must keep running end-to-end —
it is the switch-over document for a reference user."""

from __future__ import annotations


def test_quickstart_runs(spark, sf_dir, monkeypatch, capsys):
    import examples.quickstart as q

    monkeypatch.setattr("sys.argv", ["quickstart", sf_dir])
    q.main()
    out = capsys.readouterr().out
    assert "per-shard checkpoints" in out
    assert "processed=" in out
