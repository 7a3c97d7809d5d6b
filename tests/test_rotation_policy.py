"""The steady-state rotation policy (suite/__init__.py, VERDICT r7
ask #3) has a deterministic reference implementation in
scripts/next_window.py; pin its invariants against the REAL
CORRECTNESS history so a policy edit that would drop the core, seat
a ghost name, or stop cycling is caught here."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from validation_database_spark.suite import PARITY_CORE, WINDOW, _collect_all


def _mod():
    spec = importlib.util.spec_from_file_location(
        "next_window", os.path.join(REPO, "scripts", "next_window.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_current_window_starts_with_pinned_core():
    assert WINDOW[: len(PARITY_CORE)] == PARITY_CORE
    assert len(WINDOW) == 50
    assert len(set(WINDOW)) == 50


def test_policy_output_invariants_on_real_history():
    mod = _mod()
    names = list(_collect_all())
    lg = mod.last_green_rounds()
    win = mod.next_window(names, PARITY_CORE, lg)
    assert win[: len(PARITY_CORE)] == PARITY_CORE
    assert len(win) == 50 and len(set(win)) == 50
    assert set(win) <= set(names)
    # rotating seats are filled oldest-checked-first: every seated
    # spec's last-green round is <= every unseated spec's
    seated = [lg.get(n, 0) for n in win if n not in PARITY_CORE]
    unseated = [lg.get(n, 0) for n in names if n not in win]
    if unseated:
        assert max(seated) <= min(unseated)


def test_rewritten_specs_take_priority_seats():
    mod = _mod()
    names = list(_collect_all())
    lg = mod.last_green_rounds()
    # pick the green spec the policy would seat LAST (most recently
    # checked) and force-seat it as rewritten
    freshest = max(
        (n for n in names if n not in PARITY_CORE), key=lambda n: (lg.get(n, 0), n)
    )
    win = mod.next_window(names, PARITY_CORE, lg, rewritten=[freshest])
    assert win[len(PARITY_CORE)] == freshest


def test_rename_lineage_credits_history_to_current_names(tmp_path):
    """VERDICT r10 ask #5: `last_green_rounds` keys by name, so the
    r10 promotion (float `rag_retrieval` -> `_float_baseline`, quant
    `unit_rag_retrieval_quant` -> `rag_retrieval`) would silently
    reset ages without the RENAMES lineage. Pin the r10 pair on a
    synthetic history: the old names' greens must be credited to the
    CURRENT names, round-scoped (r<=9 `rag_retrieval` rows mean the
    float fold; r10 rows mean the quant headline), with no chaining
    and no dead names left in the scan."""
    import json

    mod = _mod()
    r9 = {
        "rag_retrieval": {"hash_match": True},          # float fold
        "unit_rag_retrieval_quant": {"hash_match": True},
        "keys_projection": {"hash_match": True},
    }
    r10 = {
        "rag_retrieval": {"hash_match": True},          # quant headline
        "rag_retrieval_float_baseline": {"hash_match": True},
    }
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps(r9))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(r10))
    lg = mod.last_green_rounds(repo=str(tmp_path))
    assert lg["rag_retrieval"] == 10              # quant: r9 (renamed) + r10
    assert lg["rag_retrieval_float_baseline"] == 10
    assert "unit_rag_retrieval_quant" not in lg   # dead name fully folded
    assert lg["keys_projection"] == 9             # untouched by lineage

    # without the r10 row, the quant lineage alone carries the age
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({}))
    lg = mod.last_green_rounds(repo=str(tmp_path))
    assert lg["rag_retrieval"] == 9
    assert lg["rag_retrieval_float_baseline"] == 9


def test_rename_lineage_on_real_history_leaves_no_dead_names():
    """On the REAL history: no RENAMES old-name may survive the scan
    (its rows are re-credited), every rename TARGET must be a live
    spec with its lineage age, and the quant headline's age must
    reach back to the twin's r9 first seating. (Pre-r5 retired names
    from rounds 1-4 legitimately remain in the scan — the policy
    only ever seats names from the live surface.)"""
    mod = _mod()
    lg = mod.last_green_rounds()
    names = set(_collect_all())
    assert "unit_rag_retrieval_quant" not in lg
    for _, _, new in mod.RENAMES:
        assert new in names and lg.get(new, 0) >= 9


def test_unknown_rewritten_name_is_ignored():
    mod = _mod()
    names = list(_collect_all())
    win = mod.next_window(names, PARITY_CORE, mod.last_green_rounds(), rewritten=["not_a_spec"])
    assert "not_a_spec" not in win and len(win) == 50
