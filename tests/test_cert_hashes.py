"""Certification-hash ledger freshness (ADVICE r7 gate-order signal).

tools/cert_hashes.json records sha256(query source + oracle SQL) at each
query's latest official gating; queries.py demotes hash-mismatched entries
to never-gated rank so semantic edits re-front automatically. That only
works if the ledger is refreshed once per round after the new
CORRECTNESS_r{N}.json is committed — this test fails until
``python tools/record_cert_hashes.py`` has been run against the newest
correctness file, making the refresh a forced step of the round-open
workflow rather than a remembered one.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        with open(path) as fh:
            doc = json.load(fh)
        for name, row in doc.items():
            if isinstance(row, dict):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_ledger_is_fresh_for_every_gated_query():
    ledger_path = os.path.join(REPO, "tools", "cert_hashes.json")
    assert os.path.exists(ledger_path), (
        "tools/cert_hashes.json missing — run tools/record_cert_hashes.py"
    )
    with open(ledger_path) as fh:
        ledger = json.load(fh)
    latest = _latest_rounds()
    from seoul_big_data_spark.queries import QUERIES

    stale = {
        name: (latest[name], ledger.get(name, {}).get("round"))
        for name in latest
        if name in QUERIES
        and ledger.get(name, {}).get("round", -1) < latest[name]
    }
    assert not stale, (
        "cert-hash ledger older than the newest CORRECTNESS record for "
        f"{len(stale)} queries (latest_round, ledger_round): "
        f"{dict(list(stale.items())[:5])} — run tools/record_cert_hashes.py"
    )


def test_ledger_hashes_match_current_source_for_unedited_queries():
    """Sanity: at least 90% of ledger entries must match current source —
    a wholesale mismatch means the hashing scheme drifted (e.g. a formatter
    pass), which would spuriously re-front the entire registry."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "record_cert_hashes",
        os.path.join(REPO, "tools", "record_cert_hashes.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cur = mod.current_hashes()
    with open(os.path.join(REPO, "tools", "cert_hashes.json")) as fh:
        ledger = json.load(fh)
    if not ledger:
        return
    matches = sum(
        1 for n, rec in ledger.items() if cur.get(n) == rec.get("hash")
    )
    # Threshold calibrated r10: a hashing-scheme drift (formatter pass,
    # fingerprint algorithm change) mismatches essentially EVERYTHING,
    # while a legitimate heavy-edit round stays well above half — the r10
    # optimization round edited shared leaf helpers (functions/text.py,
    # functions/vector.py) and invalidated 44/327 = 13%, which the old 90%
    # bar spuriously flagged. Those mismatches are the designed signal:
    # each demotes to rank -1 and re-fronts for official re-certification.
    assert matches / len(ledger) > 0.5, (
        f"only {matches}/{len(ledger)} ledger hashes match current source — "
        "hashing scheme drift would re-front the whole registry"
    )
