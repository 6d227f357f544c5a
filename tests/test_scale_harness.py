"""Unit tests for the weak-scaling harness's corpus-salting primitives
(tools/scale_run.py) — pure functions, no Spark.

Both salts exist to keep the scaled corpus's near-dup rate
scale-invariant; both failed subtly once (SCALE.md round-5 section), so
their invariants are pinned here: per-replica DISTINCTNESS (the x128
Caesar-exhaustion bug class) and within-replica structure preservation
(bijection / orthogonality)."""

from __future__ import annotations

import importlib.util
import os

import numpy as np

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
_spec = importlib.util.spec_from_file_location(
    "scale_run", os.path.join(_TOOLS, "scale_run.py")
)
scale_run = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_run)


def test_letter_perms_are_distinct_bijections_past_26():
    """The bug class: any salt family with fewer distinct forms than the
    replica count makes same-form replicas bit-identical duplicates of
    each other (the Caesar shift had 26 forms; x128 measured a 12.33x
    step from the resulting duplicate cliques). 256 covers every tier
    the harness can realistically build on one box."""
    perms = [scale_run._letter_perm(i) for i in range(256)]
    assert len(set(perms)) == 256
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    assert perms[0] == alphabet  # replica 0 = the original corpus
    for p in perms:
        assert sorted(p) == sorted(alphabet)  # bijection: translate() safe


def test_letter_perm_is_deterministic():
    assert scale_run._letter_perm(7) == scale_run._letter_perm(7)


def test_sign_arrays_distinct_and_orthogonal():
    """diag(±1) must (a) differ per replica so duplicated vectors
    decorrelate across replicas, (b) preserve within-replica dots
    BIT-FOR-BIT — signs square to 1 term-by-term and element order is
    unchanged, so each product term is the identical float."""
    dim = 64
    signs = [scale_run._sign_array(i, dim) for i in range(256)]
    assert len({tuple(s) for s in signs}) == 256
    assert signs[0] == [1.0] * dim
    assert all(set(s) <= {1.0, -1.0} for s in signs)

    rng = np.random.default_rng(11)
    u = rng.normal(size=dim).astype(np.float32)
    v = rng.normal(size=dim).astype(np.float32)
    base = np.dot(u.astype(np.float64), v.astype(np.float64))
    for i in (1, 31, 127):
        s = np.asarray(scale_run._sign_array(i, dim))
        du, dv = u * s, v * s
        assert np.dot(du.astype(np.float64), dv.astype(np.float64)) == base


def test_sign_array_extends_past_one_md5_block():
    """dim > 16 consumes more than one md5 digest; the block chaining
    must keep patterns deterministic and well-formed at any dim."""
    a = scale_run._sign_array(3, 200)
    assert len(a) == 200 and a == scale_run._sign_array(3, 200)


def test_recipe_markers_gate_reuse(tmp_path):
    """ADVICE r5 #1: a build made under an older salt recipe must NOT be
    silently reused. _marker_ok accepts only the CURRENT RECIPE_VERSION —
    the legacy 'ok' marker (pre-versioning builds), an older version
    string, and a missing file all read stale."""
    cur = tmp_path / "cur"
    cur.write_text(scale_run.RECIPE_VERSION + "\n")
    assert scale_run._marker_ok(str(cur))

    legacy = tmp_path / "legacy"
    legacy.write_text("ok\n")
    assert not scale_run._marker_ok(str(legacy))

    old = tmp_path / "old"
    old.write_text("r5-caesar-0\n")
    assert not scale_run._marker_ok(str(old))

    assert not scale_run._marker_ok(str(tmp_path / "missing"))

    # _write_marker round-trips
    out = tmp_path / "w"
    scale_run._write_marker(str(out))
    assert scale_run._marker_ok(str(out))


def test_merge_query_row_per_point_provenance_and_ratio_recompute():
    """ADVICE r8: (a) a partial re-measure must stamp recipe provenance
    only on the points it wrote, (b) every consecutive-pair ratio must be
    recomputed from the MERGED row (a single-tier re-measure previously
    left r32_8/r128_32 derived from the overwritten point), (c) the
    over-claiming whole-row `recipe` tag is dropped."""
    rv = scale_run.RECIPE_VERSION
    merged = {
        "q": {"x8": 2.0, "x32": 8.0, "r32_8": 4.0, "recipe": "old-recipe"}
    }
    # re-measure ONLY x32
    scale_run.merge_query_row(merged, "q", {"x32": 4.0})
    row = merged["q"]
    assert "recipe" not in row
    assert row["recipes"] == {"x32": rv}  # x8 NOT relabeled
    assert row["x8"] == 2.0 and row["x32"] == 4.0
    assert row["r32_8"] == 2.0  # recomputed from merged points

    # extend with a new tier: ratios for every derivable consecutive pair
    scale_run.merge_query_row(merged, "q", {"x128": 16.0})
    row = merged["q"]
    assert row["recipes"] == {"x32": rv, "x128": rv}
    assert row["r32_8"] == 2.0 and row["r128_32"] == 4.0

    # fresh row: no stale state paths
    scale_run.merge_query_row(merged, "new", {"x1": 1.0, "x8": 4.0})
    assert merged["new"]["r8_1"] == 4.0
    assert merged["new"]["recipes"] == {"x1": rv, "x8": rv}
