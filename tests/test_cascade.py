"""Cascade scoring, gates, NMS (C1-C7, D8 analogs)."""

import numpy as np

from ocr_hardsubx_spark.functions.scoring import StumpModel
from ocr_hardsubx_spark.operators.cascade import (
    feature_matrix,
    nonmax_suppression,
    num_inflexions,
    stage1_gate,
    stage2_gate,
)
from ocr_hardsubx_spark.operators.parse import Region, parse_document
from ocr_hardsubx_spark.sources.model_store import build_nm1, build_nm2


def test_stump_votes_match_hand_eval():
    m = StumpModel([0, 0, 1], [1.0, 5.0, 0.5], [1.0, 2.0, -1.0],
                   [-1.0, -2.0, 3.0], 2)
    # x = [0.5, 0.7]: 0.5<=1 -> +1 ; 0.5<=5 -> +2 ; 0.7>0.5 -> +3
    assert m.votes(np.array([[0.5, 0.7]]))[0] == 6.0
    # x = [10, 0.1]: -1 -2 -1 = -4
    assert m.votes(np.array([[10.0, 0.1]]))[0] == -4.0


def test_probability_logistic():
    m = StumpModel([0], [0.0], [1.0], [-1.0], 1)
    p_pos = m.probability(np.array([[-1.0]]))[0]   # votes +1
    p_neg = m.probability(np.array([[1.0]]))[0]    # votes -1
    assert abs(p_pos - 1 / (1 + np.exp(-2))) < 1e-12
    assert abs(p_neg - 1 / (1 + np.exp(2))) < 1e-12


def test_nm1_separates_content_from_nav():
    nm1 = build_nm1()
    # [text_density, link_density, 1-islands, med_crossings]
    content = nm1.probability(np.array([[120.0, 0.05, 1.0, 1.0]]))[0]
    nav = nm1.probability(np.array([[3.0, 0.95, 1.0, 1.0]]))[0]
    assert content > 0.9
    assert nav < 0.05


def test_nm2_rejects_mixed_containers():
    nm2 = build_nm2()
    clean = nm2.probability(
        np.array([[80.0, 0.04, 1.0, 1.0, 0.0, 1.0, 0.0]]))[0]
    mixed = nm2.probability(
        np.array([[15.0, 0.30, 1.0, 1.0, 0.1, 0.9, 2.0]]))[0]
    assert clean > 0.9
    assert mixed < 0.5


def test_num_inflexions_ignores_noise():
    assert num_inflexions([0.95, 0.93, 0.96]) == 0.0       # |diff| <= 0.2
    assert num_inflexions([0.95, 0.0, 0.95]) == 1.0        # down-up
    assert num_inflexions([0.9, 0.1, 0.9, 0.1]) == 2.0
    assert num_inflexions([]) == 0.0
    assert num_inflexions([0.5]) == 0.0


def test_stage1_area_gates():
    nm1 = build_nm1()
    X = np.array([
        [120.0, 0.0, 1.0, 0.0],   # good features, area below min
        [120.0, 0.0, 1.0, 0.0],   # good features, area ok
        [120.0, 0.0, 1.0, 0.0],   # good features, area above max frac
    ])
    areas = np.array([2.0, 100.0, 990.0])
    total = np.array([1000.0, 1000.0, 1000.0])
    mask, p = stage1_gate(X, areas, total, nm1)
    assert list(mask) == [False, True, False]
    assert (p > 0.9).all()


def _mk(rid, parent, depth=0):
    return Region(rid, parent, depth, "div", 0, 0, 0, 0)


def test_nms_child_supersedes_weak_root():
    # root(p=0.5) -> child(p=0.95): child wins, root flag cleared
    regions = [_mk(0, -1), _mk(1, 0, 1)]
    kept = nonmax_suppression(regions, np.array([0, 1]),
                              np.array([0.5, 0.95]))
    assert kept == [1]


def test_nms_small_diff_keeps_root():
    # diff 0.04 < MIN_PROB_DIFF: root keeps the flag
    regions = [_mk(0, -1), _mk(1, 0, 1)]
    kept = nonmax_suppression(regions, np.array([0, 1]),
                              np.array([0.95, 0.99]))
    assert kept == [0]


def test_nms_equal_chain_keeps_exactly_one():
    regions = [_mk(0, -1), _mk(1, 0, 1), _mk(2, 1, 2)]
    kept = nonmax_suppression(regions, np.array([0, 1, 2]),
                              np.array([0.9, 0.9, 0.9]))
    assert kept == [0]


def test_nms_siblings_both_survive():
    regions = [_mk(0, -1), _mk(1, 0, 1), _mk(2, 0, 1)]
    kept = nonmax_suppression(regions, np.array([0, 1, 2]),
                              np.array([0.4, 0.95, 0.97]))
    assert kept == [1, 2]


def test_nms_splices_rejected_ancestors():
    # 0 -> 1 -> 2 but only 0 and 2 accepted: 2's parent becomes 0
    regions = [_mk(0, -1), _mk(1, 0, 1), _mk(2, 1, 2)]
    kept = nonmax_suppression(regions, np.array([0, 2]),
                              np.array([0.3, 0.99]))
    assert kept == [2]


def test_nms_forest_roots_default_kept():
    regions = [_mk(0, -1), _mk(1, -1)]
    kept = nonmax_suppression(regions, np.array([0, 1]),
                              np.array([0.8, 0.9]))
    assert kept == [0, 1]


def test_feature_matrix_end_to_end_shapes():
    regions, _, ev = parse_document(
        "<body><p>text here</p><ul><li><a href='/'>x</a></li></ul></body>")
    X = feature_matrix(regions, ev)
    assert X.shape == (len(regions), 7)
    mask2, p2 = stage2_gate(X, build_nm2())
    assert mask2.shape == (len(regions),)
    assert ((p2 >= 0) & (p2 <= 1)).all()
