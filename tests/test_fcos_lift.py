"""Pin the FCOS SSOD lift in CI (VERDICT r4 next #7).

Runs the full supervised-vs-SSOD ablation (tools/learning_sanity.py
--ablation) at the ROUND4 TPU recipe scale on the hermetic CPU backend
and asserts the property the whole framework exists for: training on
extra unlabeled images through the mutual-learning phase lifts held-out
student AP over supervised-only on the same labeled set (reference
mechanism: ubteacher/engine/trainer.py:181-429; README.md:5-19).

Runtime: ~55 min on the 1-CPU container (measured 2026-08-20: 3341 s,
dominated by 1000 mutual steps at ~1.5 s/step plus four CPU compiles of
the 128px programs) — far beyond the ~10 min CI budget, so it is
skip-marked by default per the verdict's instruction and runs only with
UBT_RUN_LIFT_TEST=1. The lift property is thereby asserted somewhere a
regression WOULD fail (opt-in CI lane / manual), not only recorded in
round notes. Measured CPU result with this exact seed/recipe:
sup 10.95 -> ssod student 17.31 (+6.4), teacher 18.37.
"""

import os
import sys
import types
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("UBT_RUN_LIFT_TEST"),
    reason="measured ~55 min on the 1-CPU container (see module docstring);"
           " set UBT_RUN_LIFT_TEST=1 to run",
)
def test_fcos_ssod_lift_reproduces():
    from tools.learning_sanity import run_ablation

    args = types.SimpleNamespace(
        rcnn=False, steps=1000, burnin=600, size=128, images=64,
        label_images=8, jitter=40, bbox_thresh=None, seed=0,
    )
    out = run_ablation(args)
    # the deterministic seeded recipe that lifted +4.6 AP student /
    # +6.6 AP teacher on the TPU (ROUND4_NOTES.md:92-107) and
    # +6.4 / +7.4 on CPU (this module's docstring)
    assert out["ssod_beats_sup_student"], out
    assert out["ssod_beats_sup_teacher"], out
    # the gate must be alive (weak-teacher zero-pseudo runs can lift
    # nothing): mean pseudo boxes per 8-image batch over the mutual phase
    assert out["ssod"]["mean_pseudo_boxes"] > 1.0, out
