"""Round-5 session-3 additions: outlink diversity, crawl budget
allocation, and product-quantization ANN."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _links_ds(rows):
    return ray.data.from_arrow(pa.table({
        "src_url": pa.array([r[0] for r in rows], type=pa.string()),
        "dst_url": pa.array([r[1] for r in rows], type=pa.string()),
    }))


@pytest.mark.usefixtures("ray_session")
def test_outlink_diversity_counts_and_fraction():
    from spatula_ray.stages.graph import outlink_diversity

    rows = [
        # a.test/p1: 4 links, 2 distinct hosts, 3 external (duplicate
        # external link counts twice; internal link stays internal)
        ("https://a.test/p1", "https://b.test/x"),
        ("https://a.test/p1", "https://b.test/x"),
        ("https://a.test/p1", "https://c.test/y"),
        ("https://a.test/p1", "https://a.test/self"),
        # a.test/p2: all internal
        ("https://a.test/p2", "https://a.test/q"),
        # relative dst drops the row entirely
        ("https://a.test/p3", "/relative/only"),
        # host compare is case-insensitive
        ("https://A.test/p4", "https://a.TEST/z"),
    ]
    out = outlink_diversity(_links_ds(rows)).to_pandas() \
        .set_index("src_url")
    p1 = out.loc["https://a.test/p1"]
    assert (p1.n_links, p1.n_hosts, p1.n_external) == (4, 3, 3)
    assert p1.external_micro == 750000
    p2 = out.loc["https://a.test/p2"]
    assert (p2.n_links, p2.n_hosts, p2.n_external,
            p2.external_micro) == (1, 1, 0, 0)
    assert "https://a.test/p3" not in out.index
    p4 = out.loc["https://A.test/p4"]
    assert (p4.n_links, p4.n_external) == (1, 0)
