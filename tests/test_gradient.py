"""D4: standalone gradient-magnitude analog over child content profiles."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_hardsubx_spark.operators.cascade import (
    INFLEXION_MIN_DIFF,
    num_inflexions,
    profile_gradient,
)
from ocr_hardsubx_spark.operators.regions import regions_pandas_batch
from ocr_hardsubx_spark.sources.model_store import load_models


def test_profile_gradient_hand_values():
    assert profile_gradient([]) == (0.0, 0.0)
    assert profile_gradient([0.7]) == (0.0, 0.0)
    gmax, gmean = profile_gradient([1.0, 0.2, 0.9])
    assert gmax == pytest.approx(0.8)
    assert gmean == pytest.approx((0.8 + 0.7) / 2)


def test_gradient_consistent_with_inflexions():
    """Zero gradient magnitude above the inflexion threshold implies zero
    inflexions — the derived feature thresholds exactly these diffs."""
    flat = [0.5, 0.5 + INFLEXION_MIN_DIFF * 0.9, 0.5]
    assert profile_gradient(flat)[0] <= INFLEXION_MIN_DIFF
    assert num_inflexions(flat) == 0.0
    alternating = [1.0, 0.0, 1.0]
    assert profile_gradient(alternating)[0] > INFLEXION_MIN_DIFF
    assert num_inflexions(alternating) == 1.0


def test_regions_table_carries_gradient_columns():
    html = (b"<html><body><div class='wrap'>"
            b"<p>Plain prose paragraph number one with enough words.</p>"
            b'<ul><li><a href="/a">Link heavy block here</a></li></ul>'
            b"<p>Plain prose paragraph number two with enough words.</p>"
            b"</div></body></html>")
    nm1, nm2 = load_models()
    pdf = pd.DataFrame({"url": ["u"], "html": [html]})
    out = regions_pandas_batch(pdf, nm1, nm2)
    assert {"grad_max", "grad_mean"} <= set(out.columns)
    wrap = out[out.tag == "div"].iloc[0]
    # content -> link -> content alternation: strong profile gradient
    assert wrap["grad_max"] > 0.5
    assert 0.0 < wrap["grad_mean"] <= wrap["grad_max"]
    leaf = out[out.tag == "li"].iloc[0]
    assert (leaf["grad_max"], leaf["grad_mean"]) == (0.0, 0.0)


def test_med_crossings_sampled_equivalence():
    """_med_crossings_sampled == med_crossings(region_crossings(...)) for
    randomized regions/events (exact hot-path replacement)."""
    import random

    from ocr_hardsubx_spark.operators.cascade import _med_crossings_sampled
    from ocr_hardsubx_spark.operators.parse import (
        Region,
        med_crossings,
        region_crossings,
    )

    rng = random.Random(4242)
    for _ in range(300):
        start_line = rng.randint(0, 5)
        n_lines = rng.randint(1, 12)
        n_events = rng.randint(0, 30)
        events = sorted(rng.randint(start_line, start_line + n_lines - 1)
                        for _ in range(n_events))
        r = Region(0, -1, 0, "p", 0, 0, start_line, 0)
        r.end_line = start_line + n_lines - 1
        r.ev_start, r.ev_end = 0, len(events)
        want = med_crossings(region_crossings(r, events))
        got = _med_crossings_sampled(r, events)
        assert got == want, (start_line, n_lines, events)
