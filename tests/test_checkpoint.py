"""Checkpoint/resume: kill after wave k, resume, assert identical final
docs + URL-seen set vs an uninterrupted run (north_rule resumability)."""

import json

import pytest

from spatula_ray.engine import CrawlConfig, crawl
from spatula_ray.engine.driver import build_registry
from spatula_ray.web import (
    DocDetail,
    DocList,
    DocwebResolverFactory,
    docweb_seeds,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume_identical(tmp_path):
    factory = DocwebResolverFactory(f"{SF_DIR}/documents.parquet")
    registry = build_registry(DocList, DocDetail)
    seeds = docweb_seeds(500)

    full = crawl(seeds, registry, factory,
                 CrawlConfig(dedup="cuckoo", n_filter_shards=2, batch_size=64))
    full_rows = full.docs_sorted().take_all()

    ck = str(tmp_path / "ckpt")
    # partial run: stop after 2 waves ("the kill")
    partial = crawl(seeds, registry, factory,
                    CrawlConfig(dedup="cuckoo", n_filter_shards=2, batch_size=64,
                                checkpoint_dir=ck, max_waves=2))
    assert partial.waves == 2
    with open(f"{ck}/manifest.json") as f:
        assert json.load(f)["next_wave"] == 2

    # resume to completion
    resumed = crawl(seeds, registry, factory,
                    CrawlConfig(dedup="cuckoo", n_filter_shards=2, batch_size=64,
                                checkpoint_dir=ck))
    res_rows = resumed.docs_sorted().take_all()
    assert len(res_rows) == len(full_rows)
    for a, b in zip(res_rows, full_rows):
        assert a["doc_id"] == b["doc_id"]
        if a["record_json"] is None:   # typed-record class: struct column
            assert a["record"] == b["record"]
        else:
            assert bytes(a["record_json"]) == bytes(b["record_json"])
    assert resumed.fetched_urls() | partial.fetched_urls() == full.fetched_urls()

    # resuming a finished crawl is a no-op (does not re-seed)
    again = crawl(seeds, registry, factory,
                  CrawlConfig(dedup="cuckoo", n_filter_shards=2, batch_size=64,
                              checkpoint_dir=ck))
    assert again.counters["emitted"] == len(full_rows)
    assert again.waves == resumed.waves
