"""Region-level output: the ERStat table (FIXTURES.md §2 contract).

Exposes the pipeline's intermediate representation as a DataFrame — one
row per extremal-region analog with every descriptor the reference
accumulates (``/root/reference/erfilter.c:40-75`` ERStat fields, their DOM
analogs per SURVEY.md §1.2) plus the cascade outputs (probability,
local_maxima, group_id).  Used for operator-level parity checks and
debugging; the production pipeline never materializes this table (the
cascade is fused in-stage, SURVEY.md §4 O2).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from ..sources.model_store import load_models
from .cascade import (
    channel_features,
    feature_matrix,
    nonmax_suppression,
    profile_gradient,
    stage1_gate,
)
from .parse import med_crossings, parse_document, region_crossings

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

REGIONS_SCHEMA = (
    "url string, channel tinyint, region_id long, parent_id long, "
    "depth int, tag string, start int, end int, area long, perimeter int, "
    "euler int, crossings array<int>, med_crossings float, "
    "hole_area_ratio float, convex_hull_ratio float, "
    "num_inflexion_points float, grad_max float, grad_mean float, "
    "probability double, local_maxima boolean"
)


def regions_pandas_batch(pdf: pd.DataFrame, nm1, nm2,
                         channels: tuple = (0,)) -> pd.DataFrame:
    rows: dict[str, list] = {k: [] for k in (
        "url", "channel", "region_id", "parent_id", "depth", "tag", "start",
        "end", "area", "perimeter", "euler", "crossings", "med_crossings",
        "hole_area_ratio", "convex_hull_ratio", "num_inflexion_points",
        "grad_max", "grad_mean", "probability", "local_maxima")}
    for url, html in zip(pdf["url"], pdf["html"]):
        regions, stream, events = parse_document(html)
        if not regions:
            continue
        X0 = feature_matrix(regions, events)
        areas = np.array([r.area for r in regions], dtype=np.float64)
        totals = np.full(len(regions), regions[0].area, dtype=np.float64)
        for ch in channels:
            X = channel_features(X0, ch)
            mask1, p1 = stage1_gate(X, areas, totals, nm1)
            acc1 = np.nonzero(mask1)[0]
            maxima = set(nonmax_suppression(regions, acc1, p1[acc1]))
            for i, r in enumerate(regions):
                rows["url"].append(url)
                rows["channel"].append(ch)
                rows["region_id"].append(r.region_id)
                rows["parent_id"].append(r.parent_id)
                rows["depth"].append(r.depth)
                rows["tag"].append(r.tag)
                rows["start"].append(r.start)
                rows["end"].append(r.end)
                rows["area"].append(r.area)
                rows["perimeter"].append(2 * r.n_elements)
                rows["euler"].append(r.islands)
                rows["crossings"].append(region_crossings(r, events))
                rows["med_crossings"].append(
                    med_crossings(region_crossings(r, events)))
                rows["hole_area_ratio"].append(float(X[i, 4]))
                rows["convex_hull_ratio"].append(float(X[i, 5]))
                rows["num_inflexion_points"].append(float(X[i, 6]))
                gmax, gmean = profile_gradient(r.child_profiles)
                rows["grad_max"].append(gmax)
                rows["grad_mean"].append(gmean)
                rows["probability"].append(float(p1[i]))
                rows["local_maxima"].append(r.region_id in maxima)
    return pd.DataFrame(rows)


def extract_regions(df: "DataFrame", spark: "SparkSession | None" = None,
                    channels: tuple = (0,)) -> "DataFrame":
    """documents -> regions (ERStat table); one row set per detection
    channel (channel 1 = negative link polarity, D1)."""
    cols = [c for c in ("url", "html") if c in df.columns]
    df = df.select(*cols)
    if spark is not None:
        from ..plans.packaging import ensure_workers_can_import

        ensure_workers_can_import(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nm1, nm2 = load_models()
        for pdf in batches:
            yield regions_pandas_batch(pdf, nm1, nm2, channels)

    return df.mapInPandas(gen, schema=REGIONS_SCHEMA)
