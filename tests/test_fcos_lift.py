"""Pin the FCOS SSOD lift in CI (VERDICT r4 next #7).

Runs the full supervised-vs-SSOD ablation (tools/learning_sanity.py
--ablation) at the ROUND4 TPU recipe scale on the hermetic CPU backend
and asserts the property the whole framework exists for: training on
extra unlabeled images through the mutual-learning phase lifts held-out
student AP over supervised-only on the same labeled set (reference
mechanism: ubteacher/engine/trainer.py:181-429; README.md:5-19).

Runtime (measured 2026-08-20): the recipe needs ~2000 trainer steps
across the two arms; on the 1-CPU container a calibration run exceeded
a 2h47m budget (~6 s/mutual-step; aborted late in the sup arm), far
beyond the ~10 min CI budget, so the test is skip-marked by default per
the verdict's instruction and runs only with UBT_RUN_LIFT_TEST=1 (an
opt-in CI lane / manual run — somewhere a regression WOULD fail, not
only a note). On a TPU v5e chip the identical seeded recipe completes
in ~16 min; rerun on the round-5 tree it reproduced the lift:
sup 9.47 -> ssod student 16.94 (+7.5), teacher 17.05, pseudo gate at
23.7 boxes/batch (round-4 TPU run: +4.6/+6.6, ROUND4_NOTES.md:92-107).
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
    reason="measured >2h47m on the 1-CPU container, ~16 min on a TPU "
           "chip (see module docstring); set UBT_RUN_LIFT_TEST=1 to run",
)
def test_fcos_ssod_lift_reproduces():
    from tools.learning_sanity import run_ablation

    args = types.SimpleNamespace(
        rcnn=False, steps=1000, burnin=600, size=128, images=64,
        label_images=8, jitter=40, bbox_thresh=None, seed=0,
    )
    out = run_ablation(args)
    # the deterministic seeded recipe that lifted +4.6 AP student /
    # +6.6 AP teacher on the round-4 TPU run and +7.5/+7.6 on the
    # round-5 rerun (this module's docstring)
    assert out["ssod_beats_sup_student"], out
    assert out["ssod_beats_sup_teacher"], out
    # the gate must be alive (weak-teacher zero-pseudo runs can lift
    # nothing): mean pseudo boxes per 8-image batch over the mutual phase
    assert out["ssod"]["mean_pseudo_boxes"] > 1.0, out
