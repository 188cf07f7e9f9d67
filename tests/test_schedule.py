"""Politeness scheduling (stages/schedule.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.schedule import politeness_schedule


def _frontier(n=200, hosts=7, seed=2):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, hosts, n)
    return pd.DataFrame(
        {
            "host": [f"h{x}" for x in h],
            "url": [f"https://h{x}/p/{i}" for i, x in enumerate(h)],
            "priority": rng.integers(0, 5, n).astype(np.int64),
        }
    )


def test_matches_window_replay(ray_session):
    df = _frontier()
    out = (
        politeness_schedule(rd.from_pandas(df).repartition(5), delay_s=5)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = df.sort_values(
        ["host", "priority", "url"], ascending=[True, False, True]
    ).copy()
    exp["slot"] = exp.groupby("host").cumcount()
    exp = exp.sort_values("url").reset_index(drop=True)
    assert list(out.slot) == list(exp.slot)
    assert list(out.fetch_offset_s) == [s * 5 for s in exp.slot]
    # one fetch per slot per host, slots dense from 0
    for h, sub in out.groupby("host"):
        assert sorted(sub.slot) == list(range(len(sub)))


def test_partition_invariance(ray_session):
    df = _frontier(300, hosts=3)
    a = politeness_schedule(rd.from_pandas(df)).to_pandas()
    b = politeness_schedule(
        rd.from_pandas(df).repartition(11), num_parts=4
    ).to_pandas()
    key = ["url", "slot", "fetch_offset_s"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("url").reset_index(drop=True),
        b[key].sort_values("url").reset_index(drop=True),
    )
