"""Stump-table model construction, persistence and broadcast (S2-S4).

The reference loads two 100-stump RealAdaBoost ensembles from XML
(``/root/reference/erfilter.c:241-251`` loadclassifierNM ->
``ml.c:671-678`` load_ml -> readTree/readNode/readSplit ml.c:443-525;
models ``trained_classifierNM1.xml`` / ``NM2.xml``, ntrees=100, depth-1).
We keep the same model *shape* — 100 depth-1 stumps per stage, stage 1 over
4 features, stage 2 over 7 — but the values are derived deterministically
from explicit threshold grids tuned once on fixture statistics and frozen
as data in ``models/stumps_nm{1,2}.json`` (SURVEY.md §1.2: the classifier
is data, not code).

Feature vector layout (pinned):
  stage 1 (evalNM1 analog, erfilter.c:201-215):
    f0 text_density      = area / max(1, perimeter)       [chars per tag boundary]
    f1 link_density      = link_area / max(1, area)
    f2 one_minus_islands = 1 - islands                    [euler analog]
    f3 med_crossings     = median inline crossings at h/6,3h/6,5h/6
  stage 2 (evalNM2 analog, erfilter.c:218-233) = stage-1 features plus:
    f4 hole_area_ratio   = skipped_chars / max(1, raw_span)
    f5 convex_hull_ratio = area / max(1, raw_span)
    f6 num_inflexion_points = sign changes (|diff| > 0.2) of children's
                              (1 - link_density) profiles
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..functions.scoring import StumpModel

N_FEATURES_NM1 = 4
N_FEATURES_NM2 = 7
MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "models")


def _grid_stumps(var: int, thresholds, left_val: float, right_val: float):
    return [
        {"var": var, "le": float(t), "left_val": left_val, "right_val": right_val}
        for t in thresholds
    ]


def build_nm1() -> StumpModel:
    """Stage-1 ensemble: 100 stumps over [density, link_density, islands,
    crossings].  Grids chosen so clean content blocks score votes ~> +2
    (p ~> 0.98) and link-dominated boilerplate ~< -2 (p ~< 0.02); the gate
    is p >= 0.2 i.e. votes >= -0.693."""
    rows = []
    # 40 stumps on link_density: monotone penalty as links dominate
    rows += _grid_stumps(1, (np.arange(40) + 0.5) / 40.0, +0.055, -0.075)
    # 30 stumps on text_density (chars per tag boundary), geometric grid 1..100
    rows += _grid_stumps(0, np.geomspace(1.0, 100.0, 30), -0.05, +0.04)
    # 20 stumps on one_minus_islands: many islands -> penalty
    rows += _grid_stumps(2, 0.5 - np.arange(20), -0.03, +0.02)
    # 10 stumps on med_crossings: heavy inline churn -> mild penalty
    rows += _grid_stumps(3, np.arange(10) + 0.5, +0.015, -0.02)
    return StumpModel.from_rows(rows, N_FEATURES_NM1)


def build_nm2() -> StumpModel:
    """Stage-2 ensemble: 100 stumps over the 7-feature vector; tuned to
    reject *mixed* containers (content + boilerplate under one node) that
    slip past stage 1 — the hole/hull/inflexion features exist exactly for
    this (reference er_tree_filter, erfilter.c:928-1059)."""
    rows = []
    # 30 stumps on link_density with fine resolution at the low end
    rows += _grid_stumps(1, np.linspace(0.02, 0.40, 30), +0.05, -0.08)
    # 20 stumps on num_inflexion_points: the FIRST inflexion is decisive
    # (-3.2 votes, beating the max positive vote mass ~2.6): a container whose children alternate content/boilerplate
    # profiles must be rejected so its clean children are recovered
    # individually (stage2_with_recovery); later inflexions add smaller
    # penalties.  Safe because recovery re-tests the children — no text is
    # lost by rejecting a mixed container.
    rows += _grid_stumps(6, [0.5], +0.02, -3.2)
    rows += _grid_stumps(6, [1.5], +0.02, -0.5)
    rows += _grid_stumps(6, np.arange(2, 20) + 0.5, +0.02, -0.1)
    # 15 stumps on hole_area_ratio: skipped-content-dominated nodes penalized
    rows += _grid_stumps(4, np.linspace(0.05, 0.75, 15), +0.02, -0.06)
    # 15 stumps on convex_hull_ratio: low text coverage of bbox penalized
    rows += _grid_stumps(5, np.linspace(0.25, 0.95, 15), -0.04, +0.02)
    # 10 stumps on text_density
    rows += _grid_stumps(0, np.geomspace(2.0, 80.0, 10), -0.04, +0.03)
    # 5 on islands, 5 on crossings
    rows += _grid_stumps(2, 0.5 - np.arange(5), -0.04, +0.02)
    rows += _grid_stumps(3, np.arange(5) + 0.5, +0.01, -0.02)
    return StumpModel.from_rows(rows, N_FEATURES_NM2)


def save_models(models_dir: str = MODELS_DIR) -> None:
    os.makedirs(models_dir, exist_ok=True)
    for name, model, stage in (
        ("stumps_nm1.json", build_nm1(), 1),
        ("stumps_nm2.json", build_nm2(), 2),
    ):
        with open(os.path.join(models_dir, name), "w") as f:
            json.dump(model.to_rows(stage), f, indent=1)


def load_models(models_dir: str = MODELS_DIR) -> tuple[StumpModel, StumpModel]:
    """Load the frozen stump tables; fall back to the builders if the JSON
    files are absent (e.g. fresh checkout before `save_models`)."""
    out = []
    for name, builder, nf in (
        ("stumps_nm1.json", build_nm1, N_FEATURES_NM1),
        ("stumps_nm2.json", build_nm2, N_FEATURES_NM2),
    ):
        path = os.path.join(models_dir, name)
        if os.path.exists(path):
            with open(path) as f:
                out.append(StumpModel.from_rows(json.load(f), nf))
        else:
            out.append(builder())
    return out[0], out[1]
