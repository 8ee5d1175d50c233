"""Real-data readiness drill (VERDICT r4 item 6).

The real AMASS/DIP-IMU archives and the reference's shipped trained
checkpoints are stripped from this image (reference .MISSING_LARGE_BLOBS),
so BASELINE parity on DIP s09/10 cannot be produced here. This module
drives the EXACT surfaces real data would hit the day it appears, from
fixtures byte-shaped like the real releases:

  * a torch checkpoint FILE saved by the reference's own save call
    (train_model.py:220-225: ``torch.save(model.state_dict(), path)``) —
    plus a ``torch.nn.DataParallel``-wrapped variant whose keys carry the
    ``module.`` prefix;
  * a DIP-IMU pkl shaped like the official release (python2-compatible
    pickle; 'imu_ori' (T,17,3,3), 'imu_acc' (T,17,3), 'gt' (T,72) SMPL
    axis-angles, NaN sensor-dropout bursts — reference
    preprocess_DIP_TC_new.py:55-136);
  * the real commands, documented in README ("Real-data readiness"):
      python -m tip_tpu.cli.import_torch_ckpt --pt model-without-dip9and10.pt \
          --out output/imported --five_sbp --with_acc_sum
      python -m tip_tpu.cli.evaluate --ckpt output/imported --five_sbp \
          --with_acc_sum --data_root data --tag v1 --name_contains dipimu_s_09

Together these certify: torch-file deserialisation, weight translation
(incl. the DataParallel prefix), orbax round-trip, DIP preprocessing with
dropout imputation, SBP label merge, and the metric protocol — everything
between "download the release" and "Table-1 numbers".
"""

import os
import pickle
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu.data_gen import dip as dip_lib
from tip_tpu.models import tip_model as M
from tip_tpu.train import train as train_lib

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference/simple_transformer_with_state.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_PATH),
                                reason="reference mount not present")

# the shipped-checkpoint configuration (reference README step 4 /
# train_model.py:21-74): 72-d IMU + acc-sum, 131-d state (5 SBPs)
PAPER = M.ModelConfig(input_size_imu=72, size_s=131, with_acc_sum=True,
                      tf_in_dim=256, tf_hid_size=1024, n_heads=16,
                      tf_layers=4, rnn_hid_size=512)


def _reference_model():
    import importlib.util
    spec = importlib.util.spec_from_file_location("ref_tf_rnn_drill",
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(7)
    # p=0 dropouts for a deterministic forward (same weights/arch — the
    # reference's inline nn.Dropout has no eval path, see
    # test_reference_parity.py); the state_dict FORMAT is identical.
    return mod.TF_RNN_Past_State(
        input_size_imu=72, size_s=131, rnn_hid_size=512, tf_hid_size=1024,
        tf_in_dim=256, n_heads=16, tf_layers=4, dropout=0.1, in_dropout=0.0,
        past_state_dropout=0.0, with_rnn=True, with_acc_sum=True).eval()


@pytest.fixture(scope="module")
def saved_pt(tmp_path_factory):
    """A .pt file written by the reference's exact save call."""
    d = tmp_path_factory.mktemp("refckpt")
    m = _reference_model()
    path = str(d / "model-without-dip9and10.pt")
    torch.save(m.state_dict(), path)           # train_model.py:223
    return m, path


@pytest.fixture(scope="module")
def imported_ckpt(saved_pt, tmp_path_factory):
    """Drive the import CLI on the saved FILE (not an in-process dict)."""
    from tip_tpu.cli import import_torch_ckpt
    _, pt_path = saved_pt
    out = str(tmp_path_factory.mktemp("orbax") / "imported")
    argv = sys.argv
    sys.argv = ["import_torch_ckpt", "--pt", pt_path, "--out", out,
                "--five_sbp", "--with_acc_sum"]
    try:
        import_torch_ckpt.main()
    finally:
        sys.argv = argv
    return out


def test_import_cli_roundtrips_reference_save_file(saved_pt, imported_ckpt):
    """.pt file -> import CLI -> orbax -> restore -> forward parity."""
    ref, _ = saved_pt
    cfg_t = train_lib.TrainConfig(model=PAPER, n_sbps=5)
    state = train_lib.restore_checkpoint(imported_ckpt, cfg_t,
                                         params_only=True)
    rng = np.random.default_rng(3)
    x_imu = rng.normal(size=(2, 40, 90)).astype(np.float32)
    x_s = (rng.normal(size=(2, 40, 131)) * 0.3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x_imu), torch.tensor(x_s)).numpy()
    y = np.asarray(M.forward(state.params, jnp.asarray(x_imu),
                             jnp.asarray(x_s), PAPER))
    # f32 end to end on both sides (the drill certifies the FILE path;
    # bit-level parity is pinned separately in f64 by
    # test_reference_parity.py) — tolerance covers f32 reduction-order
    # differences through 4 encoder layers + the RNN
    np.testing.assert_allclose(y, y_ref, atol=2e-3)


def test_import_accepts_dataparallel_prefixed_state_dict(saved_pt, tmp_path):
    """A checkpoint saved from a DataParallel-wrapped model ('module.'
    prefix on every key) imports to the identical pytree."""
    ref, _ = saved_pt
    wrapped = torch.nn.DataParallel(ref)
    path = str(tmp_path / "model-dp.pt")
    torch.save(wrapped.state_dict(), path)
    sd = torch.load(path, map_location="cpu")
    assert all(k.startswith("module.") for k in sd)
    p_dp = M.params_from_torch_state_dict(sd, PAPER)
    p_plain = M.params_from_torch_state_dict(ref.state_dict(), PAPER)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# DIP-IMU release-shaped pickle -> preprocessing -> evaluate
# ---------------------------------------------------------------------------

def _release_shaped_dip_pkl(path, T=400, seed=0):
    """Fabricate a pkl with the official DIP-IMU release's layout: 17
    sensor slots, NaN dropout bursts, python2-compatible pickling."""
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(seed)
    ori = np.tile(np.eye(3), (T, 17, 1, 1))
    base = Rotation.from_rotvec(rng.normal(size=(17, 3)) * 0.2)
    for t in range(T):
        base = Rotation.from_rotvec(rng.normal(size=(17, 3)) * 0.01) * base
        ori[t] = base.as_matrix()
    acc = rng.normal(size=(T, 17, 3)) * 0.8
    # dropout bursts on two USED slots (lwrist slot 7, head slot 0):
    # mid-sequence like real Xsens dropouts; imputed by the trailing-mean
    # rule (reference :112-136)
    ori[100:104, 7] = np.nan
    acc[100:104, 7] = np.nan
    ori[200:202, 0] = np.nan
    acc[200:202, 0] = np.nan
    # smooth SMPL pose stream (24 joints axis-angle), no translation
    gt = np.cumsum(rng.normal(size=(T, 72)) * 0.002, axis=0)
    with open(path, "wb") as f:
        pickle.dump({"imu_ori": ori, "imu_acc": acc, "gt": gt}, f,
                    protocol=2)


def test_dip_release_pkl_preprocesses(tmp_path):
    src = str(tmp_path / "dipimu_s_09_01.pkl")
    _release_shaped_dip_pkl(src)
    out = dip_lib.preprocess_dip_file(src)
    imu, qdq = out["imu"], out["nimble_qdq"]
    assert imu.shape[1] == 72 and qdq.shape[1] == 2 * cst.N_DOFS
    assert np.isfinite(imu).all() and np.isfinite(qdq).all()
    # synthetic upright root: fixed z offset, zero xy (reference :100-107)
    np.testing.assert_allclose(qdq[:, 0:2], 0.0, atol=1e-12)
    np.testing.assert_allclose(qdq[:, 2], cst.ROOT_Z_OFFSET, atol=1e-12)


def test_dip_drill_end_to_end_evaluate_cli(imported_ckpt, tmp_path):
    """The full day-one command sequence: release pkl -> preprocess ->
    SBP merge -> split -> cli/evaluate on the imported torch checkpoint."""
    raw = tmp_path / "raw"
    sbp = tmp_path / "sbp"
    pre = tmp_path / "pre"
    data_root = tmp_path / "data"
    vdir = data_root / "preprocessed_DIP_IMU_v1"
    for d in (raw, sbp, pre, data_root, vdir):
        d.mkdir()

    name = "dipimu_s_09_01.pkl"
    _release_shaped_dip_pkl(str(raw / name))
    out = dip_lib.preprocess_dip_file(str(raw / name))
    with open(pre / name, "wb") as f:
        pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
    # shipped-fixture-shaped SBP labels: (T, 20) [flag, offset xyz] x 5
    T = len(out["imu"])
    c = np.zeros((T, 20))
    c[:, 0] = 1.0                                # lankle in contact
    with open(sbp / name, "wb") as f:
        pickle.dump({"constrs": c}, f, protocol=pickle.HIGHEST_PROTOCOL)
    assert dip_lib.augment_with_sbp(str(pre), str(sbp), str(vdir)) == 1

    from tip_tpu.cli import evaluate as eval_cli
    argv = sys.argv
    sys.argv = ["evaluate", "--ckpt", imported_ckpt, "--five_sbp",
                "--with_acc_sum", "--data_root", str(data_root),
                "--tag", "v1", "--name_contains", "dipimu_s_09",
                "--test_len", "400",
                "--metrics", str(tmp_path / "metrics.jsonl")]
    try:
        eval_cli.main()
    finally:
        sys.argv = argv

    import json
    with open(tmp_path / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    summary = [r for r in rows if r.get("kind") == "summary"]
    assert summary and summary[0]["n_motions"] == 1
    means = summary[0]["means"]
    assert all(np.isfinite(v) for v in means.values()), means
