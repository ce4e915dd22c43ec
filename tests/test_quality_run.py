"""Artifact hygiene of the pinned-band runner (scripts/quality_run.py).

VERDICT r4 weak #2: an ``--extra`` experiment arm used to write its
metrics stream to the same ``results/{scene}{iters}_metrics.jsonl`` path
as the pinned plain run, silently clobbering committed band evidence.
Arms must land under their own slug-keyed filenames.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from quality_run import arm_slug  # noqa: E402


def test_plain_run_has_no_suffix():
    assert arm_slug([]) == ""
    assert arm_slug([], None) == ""


def test_extra_arm_gets_distinct_suffix():
    slug = arm_slug(["--distortion_loss", "0.01"])
    assert slug.startswith("_")
    assert slug != ""
    # The clobber scenario: the arm's artifact name differs from the
    # pinned plain stream's name.
    assert f"llff_36050000{slug}_metrics.jsonl" != "llff_36050000_metrics.jsonl"


def test_different_arms_get_different_suffixes():
    a = arm_slug(["--freq_anneal", "1500"])
    b = arm_slug(["--freq_anneal", "25000"])
    c = arm_slug(["--distortion_loss", "0.01"])
    d = arm_slug(["--distortion_loss", "0.01", "--distortion_ramp", "4000"])
    assert len({a, b, c, d}) == 4


def test_defect_keys_the_artifact_too():
    assert arm_slug([], "n_fine0") != ""
    assert arm_slug([], "n_fine0") != arm_slug([], "ndc_reference")


def test_slug_is_filename_safe_and_bounded():
    slug = arm_slug(["--weird/flag=1;rm -rf", "--x", "9" * 200])
    assert len(slug) <= 61
    assert all(ch.isalnum() or ch in "_-" for ch in slug.lstrip("_") + "x")
    # Long token sets stay distinct via the hash tail.
    other = arm_slug(["--weird/flag=1;rm -rf", "--x", "8" * 200])
    assert slug != other


def test_scene_all_rejects_extra(monkeypatch, capsys):
    """The sweep's child commands forward only --scene/--iters: silently
    accepting --extra would run every scene PLAIN while the operator
    transcribes the verdicts as an experiment-arm measurement."""
    import pytest
    import quality_run

    monkeypatch.setattr(
        sys, "argv",
        ["quality_run.py", "--scene", "all", "--iters", "3000",
         "--extra", "--ema_decay", "0.995"])
    with pytest.raises(SystemExit, match="extra"):
        quality_run.main()
