"""GAN-dynamics parity vs the torch reference (VERDICT r1 #4).

Drives scripts/convergence_check.py's harness for a few steps: identical
batches + imported identical weights through the reference's real
Vid2VidModel D/G alternation and our train_step, then asserts the loss
trajectories track.  This is the test that catches optimizer/spectral-norm/
loss-definition divergences (it found the reference's saturating G-hinge
quirk, loss_collector.py:66).
"""
import pathlib
import sys

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # >60s on one CPU (see pytest.ini)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "scripts"))
import convergence_check as cc


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    init = str(tmp_path_factory.mktemp("conv") / "init.pt")
    batches = cc.make_batches(3)
    t_rec = cc.run_torch(batches, init)
    j_rec = cc.run_ours(batches, init)
    return t_rec, j_rec


class TestConvergenceParity:
    def test_step1_losses_match_reference(self, records):
        t_rec, j_rec = records
        for k in cc.LOSS_KEYS:
            assert abs(t_rec[0][k] - j_rec[0][k]) <= \
                2e-2 * max(1.0, abs(t_rec[0][k])), \
                f"{k}: torch {t_rec[0][k]} vs ours {j_rec[0][k]}"

    def test_losses_track_through_step3(self, records):
        """After two optimizer steps on both sides the trajectories must
        still track (drift budget covers fp32 op-order + the reference's
        2-power-iterations-per-step vs our 1)."""
        t_rec, j_rec = records
        for k in cc.LOSS_KEYS:
            assert abs(t_rec[2][k] - j_rec[2][k]) <= \
                0.15 * max(1.0, abs(t_rec[2][k])), \
                f"{k}: torch {t_rec[2][k]} vs ours {j_rec[2][k]}"


class TestFaithfulStep:
    def test_faithful_mode_matches_every_step(self, tmp_path):
        """train_step_faithful reproduces the reference alternation exactly
        (two generator forwards, per-phase spectral advancement, sequential
        D-then-G), so EVERY step's losses must match tightly — not just
        step 1.  The drift budget here is float-reassociation only, an
        order of magnitude tighter than the default-step step-3 budget."""
        init = str(tmp_path / "init.pt")
        batches = cc.make_batches(4)
        t_rec = cc.run_torch(batches, init)
        j_rec = cc.run_ours(batches, init, faithful=True)
        for step in range(4):
            for k in cc.LOSS_KEYS:
                assert abs(t_rec[step][k] - j_rec[step][k]) <= \
                    2e-2 * max(1.0, abs(t_rec[step][k])), \
                    (f"step {step} {k}: torch {t_rec[step][k]} "
                     f"vs ours {j_rec[step][k]}")
