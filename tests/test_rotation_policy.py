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


def test_unknown_rewritten_name_is_ignored():
    mod = _mod()
    names = list(_collect_all())
    win = mod.next_window(names, PARITY_CORE, mod.last_green_rounds(), rewritten=["not_a_spec"])
    assert "not_a_spec" not in win and len(win) == 50
