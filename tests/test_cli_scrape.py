"""End-to-end `scrape` CLI: full crawl -> parquet docs + JSON-per-record
output dir (reference cli.py:383-431 shape)."""

import json
import os

import pytest

from spatula_ray.cli import main


@pytest.mark.usefixtures("ray_session")
def test_cli_scrape_end_to_end(tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main([
        "scrape", "spatula_ray.web.MixedIndex",
        "--resolver", "spatula_ray.web:MixedResolverFactory",
        "-o", out, "--dedup", "exact", "--json-records",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "success: wrote 6 objects" in stdout

    docs_dir = os.path.join(out, "docs")
    assert os.path.isdir(docs_dir) and os.listdir(docs_dir)
    import pyarrow.parquet as pq

    t = pq.read_table(docs_dir)
    assert t.num_rows == 6

    records_dir = os.path.join(out, "records")
    files = sorted(os.listdir(records_dir))
    assert len(files) == 6
    rec = json.load(open(os.path.join(records_dir, files[0])))
    assert rec["kind"] in ("csv", "xml", "pdf")


@pytest.mark.usefixtures("ray_session")
def test_cli_scrape_dump_and_rmdir(tmp_path, capsys):
    """--dump module.func controls record serialization; --rmdir clears a
    pre-existing output dir (reference cli.py:134-140, --rmdir)."""
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "stale"))
    rc = main([
        "scrape", "spatula_ray.web.MixedIndex",
        "--resolver", "spatula_ray.web:MixedResolverFactory",
        "-o", out, "--dedup", "exact", "--json-records", "--rmdir",
        "--dump", "test_cli.upper_dump",
    ])
    assert rc == 0
    assert not os.path.isdir(os.path.join(out, "stale"))
    records_dir = os.path.join(out, "records")
    files = sorted(os.listdir(records_dir))
    assert len(files) == 6
    body = open(os.path.join(records_dir, files[0])).read()
    assert body == body.upper() and '"KIND"' in body


def test_cli_scrape_refuses_nonempty_output(tmp_path):
    out = str(tmp_path / "occupied")
    os.makedirs(out)
    open(os.path.join(out, "existing.txt"), "w").close()
    with pytest.raises(SystemExit, match="not empty"):
        main(["scrape", "spatula_ray.web.MixedIndex",
              "--resolver", "spatula_ray.web:MixedResolverFactory",
              "-o", out])
    assert os.path.exists(os.path.join(out, "existing.txt"))


@pytest.mark.usefixtures("ray_session")
def test_cli_scrape_default_dated_dir(tmp_path, monkeypatch, capsys):
    """No -o: dated auto-increment dir (reference cli.py:395-407)."""
    import datetime

    monkeypatch.chdir(tmp_path)
    rc = main(["scrape", "spatula_ray.web.MixedIndex",
               "--resolver", "spatula_ray.web:MixedResolverFactory",
               "--dedup", "exact"])
    assert rc == 0
    date = datetime.date.today().isoformat()
    assert os.path.isdir(os.path.join("_scrapes", date, "001"))
    rc = main(["scrape", "spatula_ray.web.MixedIndex",
               "--resolver", "spatula_ray.web:MixedResolverFactory",
               "--dedup", "exact"])
    assert rc == 0
    assert os.path.isdir(os.path.join("_scrapes", date, "002"))
