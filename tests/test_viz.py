"""Plot tools smoke tests (write PNGs from synthesized data)."""

import os

import numpy as np

from tip_tpu.data_gen import amass_syn
from tip_tpu.viz import plots

import test_data_pipeline as TDP


def test_plots_from_synthesized_motion(tmp_path):
    motion = TDP.make_synthetic_motion(T=200)
    out = amass_syn.synthesize(motion, height=1.7,
                               rng=np.random.default_rng(0))

    p1 = tmp_path / "sbp.png"
    plots.plot_sbp_labels(out["constrs"], str(p1))
    assert os.path.getsize(p1) > 1000

    fk = amass_syn.fk_motion(*TDP.smpl.resample_motion(motion)[:2], 1.7)
    pq_lankle = np.asarray(fk["pq_sbp"])[:, 0]
    p2 = tmp_path / "drift.png"
    drift = plots.plot_sbp_residue_drift(pq_lankle, out["constrs"][:, :4],
                                         str(p2))
    assert os.path.getsize(p2) > 1000
    # residue drift during genuine contacts stays small
    assert np.abs(drift).max() < 0.5

    p3 = tmp_path / "overlay.png"
    plots.plot_imu_overlay(out["imu"], out["imu"] * 0.98, str(p3))
    assert os.path.getsize(p3) > 1000
