"""Deterministic per-host priority queue: under a wave quota, higher-
priority (lower number) frontier rows are fetched in earlier waves, and
the page log records the wave lineage."""

import pytest

from spatula_ray.engine import CrawlConfig, crawl
from spatula_ray.engine.driver import build_registry
from spatula_ray.web import FormulaResolverFactory


@pytest.mark.usefixtures("ray_session")
def test_priority_order_under_quota():
    from spatula_ray import HtmlPage

    class HiPage(HtmlPage):
        priority = 0

        def get_source_from_input(self):
            return self.input["url"]

        def process_page(self):
            return {"p": "hi"}

    class LoPage(HtmlPage):
        priority = 5

        def get_source_from_input(self):
            return self.input["url"]

        def process_page(self):
            return {"p": "lo"}

    factory = FormulaResolverFactory(n_hosts=1, pages_per_host=20,
                                     links_per_page=2, seed=3)
    seeds = ([LoPage({"url": f"https://h0.bench.test/p/{i}"}) for i in range(6)]
             + [HiPage({"url": f"https://h0.bench.test/p/{i + 6}"})
                for i in range(6)])
    result = crawl(seeds, build_registry(HiPage, LoPage), factory,
                   CrawlConfig(dedup=None, per_host_wave_quota=3,
                               expand=False, batch_size=4))
    waves = {"HiPage": [], "LoPage": []}
    for r in result.page_log.take_all():
        waves[r["page_class"]].append(r["wave"])
    assert len(waves["HiPage"]) == len(waves["LoPage"]) == 6
    # every high-priority fetch happens strictly before any low-priority one
    assert max(waves["HiPage"]) < min(waves["LoPage"])
    assert result.counters["priority_deferred"] > 0
