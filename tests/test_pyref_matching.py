"""Greedy record-matching metric semantics (reference dee/metrics.py:42-95,
156-165) — the acceptance gate; order-sensitivity tested explicitly."""

from docee_spark.pyref.matching import (
    event_role_tpfpfn,
    micro_prf1,
    prf1,
    records_from_events,
)


def test_exact_match_all_tp():
    recs = [("a", "b", None)]
    assert event_role_tpfpfn(recs, recs, 3) == [[1, 0, 0], [1, 0, 0], [0, 0, 0]]


def test_pred_none_all_fn():
    gold = [("a", None, "c")]
    assert event_role_tpfpfn(None, gold, 3) == [[0, 0, 1], [0, 0, 0], [0, 0, 1]]


def test_gold_none_all_fp():
    pred = [("a", None, "c")]
    assert event_role_tpfpfn(pred, None, 3) == [[0, 1, 0], [0, 0, 0], [0, 1, 0]]


def test_wrong_value_is_fp_and_fn():
    assert event_role_tpfpfn([("x",)], [("y",)], 1) == [[0, 1, 1]]


def test_pred_null_gold_value_fn_only():
    assert event_role_tpfpfn([(None,)], [("y",)], 1) == [[0, 0, 1]]


def test_pred_value_gold_null_fp_only():
    assert event_role_tpfpfn([("x",)], [(None,)], 1) == [[0, 1, 0]]


def test_sort_by_nonnull_desc_before_matching():
    # fuller pred record must match first: pred2 (2 non-null) takes gold
    # ("a","b"); pred1 then pairs with leftover gold → order-independence
    gold = [("a", "b"), ("a", None)]
    pred_lofirst = [("a", None), ("a", "b")]
    pred_hifirst = [("a", "b"), ("a", None)]
    s1 = event_role_tpfpfn(pred_lofirst, gold, 2)
    s2 = event_role_tpfpfn(pred_hifirst, gold, 2)
    assert s1 == s2 == [[2, 0, 0], [1, 0, 0]]


def test_best_similarity_gold_wins():
    # pred more similar to gold[1] (2 equal roles) than gold[0] (1) →
    # matches gold[1] even though it is later in the list
    gold = [("a", "x"), ("a", "y")]
    pred = [("a", "y")]
    stats = event_role_tpfpfn(pred, gold, 2)
    # match gold[1]: role0 TP, role1 TP; leftover gold[0] → both FN
    assert stats == [[1, 0, 1], [1, 0, 1]]


def test_tie_break_earliest_gold():
    # equal similarity (1 each) → EARLIEST gold taken (list.index
    # semantics of the reference, dee/metrics.py:57)
    gold = [("a", "x"), ("a", "z")]
    pred = [("a", "y")]
    stats = event_role_tpfpfn(pred, gold, 2)
    # match gold[0]: role0 TP, role1 y≠x → FP+FN; leftover gold[1] →
    # role0 FN, role1 FN
    assert stats == [[1, 0, 1], [0, 1, 2]]


def test_leftover_preds_are_fp():
    gold = [("a",)]
    pred = [("a",), ("b",)]
    assert event_role_tpfpfn(pred, gold, 1) == [[1, 1, 0]]


def test_prf1_zero_denominators():
    assert prf1(0, 0, 0) == (0.0, 0.0, 0.0)
    assert prf1(1, 0, 0) == (1.0, 1.0, 1.0)
    p, r, f = prf1(1, 1, 3)
    assert abs(p - 0.5) < 1e-12 and abs(r - 0.25) < 1e-12
    assert abs(f - (2 * 0.5 * 0.25 / 0.75)) < 1e-12


def test_micro_rollup():
    stats = [
        [[[1, 0, 0], [0, 1, 0]]],
        [[[1, 0, 1]]],
    ]
    p, r, f, tp, fp, fn = micro_prf1(stats)
    assert (tp, fp, fn) == (2, 1, 1)
    assert abs(p - 2 / 3) < 1e-12 and abs(r - 2 / 3) < 1e-12


def test_records_from_events_role_order():
    evs = [{"type": "T", "args": {"r2": "b", "r1": "a"}}]
    out = records_from_events(evs, {"T": ["r1", "r2", "r3"]})
    assert out == {"T": [("a", "b", None)]}
