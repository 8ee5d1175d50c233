"""End-to-end data pipeline: synthesis -> packing -> training -> evaluation."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu import constants as cst
from tip_tpu import eval_harness as H
from tip_tpu.data_gen import amass_syn, combine as combine_lib, smpl
from tip_tpu.models import tip_model as M
from tip_tpu.ops import kinematics as kin
from tip_tpu.runtime import runner as runner_lib
from tip_tpu.train import data as data_lib
from tip_tpu.train import train as train_lib

RNG = np.random.default_rng(21)


def make_synthetic_motion(T=260, fps=120.0, moving=True) -> smpl.SmplMotion:
    """Smooth random SMPL motion around a standing pose."""
    t = np.arange(T) / fps
    poses = np.zeros((T, 24, 3))
    poses[:, 0] = [1.20919958, 1.20919958, 1.20919958]   # upright, z-up
    # swing a few joints smoothly
    for j, amp, f in ((1, 0.3, 0.7), (2, 0.3, 0.7), (16, 0.4, 0.5),
                      (17, 0.4, 0.6), (4, 0.25, 0.9), (5, 0.25, 0.8)):
        poses[:, j, 0] = amp * np.sin(2 * np.pi * f * t)
        poses[:, j, 2] = 0.3 * amp * np.cos(2 * np.pi * f * t)
    trans = np.zeros((T, 3))
    trans[:, 2] = 0.95
    if moving:
        trans[:, 0] = 0.4 * t
    return smpl.SmplMotion(poses=poses, trans=trans, fps=fps)


def test_synthesize_shapes_and_validity():
    motion = make_synthetic_motion()
    out = amass_syn.synthesize(motion, height=1.7,
                               rng=np.random.default_rng(0))
    T = len(out["imu"])
    assert out["imu"].shape == (T, 72)
    assert out["nimble_qdq"].shape == (T, 114)
    assert out["constrs"].shape == (T, 20)
    assert np.isfinite(out["imu"]).all()

    # orientations are valid rotations
    Rm = out["imu"][:, :54].reshape(T, 6, 3, 3)
    eye = np.einsum("tnij,tnkj->tnik", Rm, Rm)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)

    # root velocity label matches the translation derivative (x: 0.4 m/s
    # scaled by h/1.6 only in the IMU, not qdq)
    v = out["nimble_qdq"][10:-10, 57]
    np.testing.assert_allclose(v, 0.4, atol=1e-6)


def test_synthesize_static_motion_properties():
    motion = make_synthetic_motion(moving=False)
    # freeze the whole body -> feet SBPs active almost everywhere
    motion.poses[:] = motion.poses[0]
    motion.poses[:, 1:] = 0.0
    out = amass_syn.synthesize(motion, height=1.7,
                               rng=np.random.default_rng(0))
    c = out["constrs"]
    assert c[5:-5, 0].mean() > 0.9        # lankle flag
    assert c[5:-5, 4].mean() > 0.9        # rankle flag
    # static motion: accelerations ~ 0
    assert np.abs(out["imu"][5:-5, 54:]).max() < 1e-4


def test_qdq_roundtrip_through_fk():
    """qdq -> bullet pose -> FK must land the IMU links where the synthesis
    placed them (same skeleton, scale 1.0 path)."""
    motion = make_synthetic_motion()
    aa60, trans60, _ = smpl.resample_motion(motion)
    qdq = amass_syn.nimble_qdq(aa60, trans60)
    fk_pts = amass_syn.fk_motion(aa60, trans60, height=1.6)   # scale 1.0
    skel = kin.amass_skeleton(dtype=jnp.float64)
    pq = np.asarray(jax.vmap(lambda s: kin.fk_our_state(skel, s))(
        jnp.asarray(qdq)))
    # lknee IMU point (sensor 3) == FK CoM of link 1
    np.testing.assert_allclose(np.asarray(fk_pts["pq_imu"])[:, 3, :3],
                               pq[:, 2, :3], atol=1e-6)


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    """Synthesize 3 motions, pack them, return the blob prefix + pkl dir."""
    root = tmp_path_factory.mktemp("pipeline")
    pkl_dir = root / "syn_TEST_v1"
    pkl_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        # >= 2.5 s at 60 Hz after resampling (the harness drops shorter clips)
        motion = make_synthetic_motion(T=340 + 40 * i)
        out = amass_syn.synthesize(motion, rng=rng)
        with open(pkl_dir / f"motion_{i}.pkl", "wb") as f:
            pickle.dump(out, f)
    prefix = str(root / "train_test")
    combine_lib.combine([str(pkl_dir)], [1], prefix, seed=0)
    return prefix, str(pkl_dir)


def test_combine_blob_format(pipeline_dir):
    prefix, pkl_dir = pipeline_dir
    ds = data_lib.PackedDataset.load(prefix + "_imu.npy", prefix + "_s.npy",
                                     prefix + "_info.npy")
    assert ds.imu.shape[1] == 72
    assert ds.acc_sum.shape[1] == 18
    assert ds.s.shape[1] == 131
    assert ds.info.shape == (3, 3)
    assert ds.info[-1, 1] == len(ds.imu)
    assert np.isfinite(ds.imu[:]).all()
    # local features: the root sensor's rotation block passes through the
    # localisation unchanged (only the ±4-frame crop applies to it — the
    # smoothing and bias noise touch acc channels 54:72 only)
    for i, (start, end, rate) in enumerate(np.asarray(ds.info)):
        with open(os.path.join(pkl_dir, f"motion_{i}.pkl"), "rb") as f:
            payload = pickle.load(f)
        raw = np.asarray(payload["imu"])
        m_len = min(len(raw), len(payload["nimble_qdq"]))
        np.testing.assert_allclose(ds.imu[start:end, :9],
                                   raw[4:m_len - 4, :9].astype(np.float32),
                                   rtol=1e-6)


def test_train_on_synthesized_data(pipeline_dir):
    prefix, _ = pipeline_dir
    ds = data_lib.PackedDataset.load(prefix + "_imu.npy", prefix + "_s.npy",
                                     prefix + "_info.npy")
    tiny = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
                         rnn_hid_size=24)
    cfg = train_lib.TrainConfig(model=tiny, batch_size=16, seq_len=20,
                                lr=1e-3, epochs=1, log_interval=1000)
    state = train_lib.init_state(cfg)
    step = train_lib.make_train_step(cfg)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(3):
        for x_imu, x_s, y in data_lib.epoch_batches(ds, cfg.seq_len,
                                                    cfg.batch_size, rng):
            state, aux = step(state, jnp.asarray(x_imu), jnp.asarray(x_s),
                              jnp.asarray(y))
            losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_eval_harness_end_to_end(pipeline_dir):
    _, pkl_dir = pipeline_dir
    tiny = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
                         rnn_hid_size=24)
    params = M.init_params(jax.random.PRNGKey(0), tiny)
    cfg = H.EvalConfig(runner=runner_lib.RunnerConfig(model=tiny),
                       test_len=200, max_motions_per_cat=2)
    files = [os.path.join(pkl_dir, f) for f in sorted(os.listdir(pkl_dir))]
    per_motion, means, maxima = H.evaluate(params, cfg, files,
                                           log=lambda *a: None)
    assert len(per_motion) == 2
    for k in H.METRIC_NAMES:
        assert np.isfinite(means[k]), (k, means)


def test_eval_harness_cached_serving_mode(pipeline_dir):
    """The 7-metric protocol runs under the KV-cached serving modes too
    (cli/evaluate --serving_mode; full runner + kv_cache_rnn_carry here),
    and pre-slide its trajectory is exactly the recompute protocol's."""
    _, pkl_dir = pipeline_dir
    tiny = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
                         rnn_hid_size=24)
    params = M.init_params(jax.random.PRNGKey(0), tiny)
    files = [os.path.join(pkl_dir, f) for f in sorted(os.listdir(pkl_dir))][:1]
    for mode in ("kv_cache_rnn_carry",):
        cfg = H.EvalConfig(
            runner=runner_lib.RunnerConfig(model=tiny, serving_mode=mode),
            use_full_runner=True, multi_sbp=True,
            test_len=200, max_motions_per_cat=1)
        per_motion, means, _ = H.evaluate(params, cfg, files,
                                          log=lambda *a: None)
        assert len(per_motion) == 1
        for k in H.METRIC_NAMES:
            assert np.isfinite(means[k]), (mode, k, means)


def test_metrics_zero_for_perfect_prediction(pipeline_dir):
    _, pkl_dir = pipeline_dir
    with open(os.path.join(pkl_dir, "motion_0.pkl"), "rb") as f:
        payload = pickle.load(f)
    qdq = payload["nimble_qdq"][:150]
    skel = kin.amass_skeleton()
    m = H.compute_metrics(skel, qdq, qdq.copy(), H.EvalConfig())
    assert m["angle_deg"] < 1e-3
    assert m["j_pos_cm"] < 1e-3
    assert m["root_drift_5s"] < 1e-5


def test_eval_harness_full_runner_multi_sbp_and_hooks(pipeline_dir, tmp_path):
    """The eval protocol exercises the full runner's SBP-conditioned IK
    feedback + pelvis terrain (EvalConfig.multi_sbp, VERDICT r1 #6), emits
    structured jsonl records, and feeds the viz hook per motion."""
    import json

    _, pkl_dir = pipeline_dir
    tiny = M.ModelConfig(tf_in_dim=32, tf_hid_size=64, n_heads=4, tf_layers=2,
                         rnn_hid_size=24)
    params = M.init_params(jax.random.PRNGKey(0), tiny)
    files = [os.path.join(pkl_dir, f) for f in sorted(os.listdir(pkl_dir))][:1]

    from tip_tpu.utils.observability import MetricsWriter

    results = {}
    for multi_sbp in (False, True):
        cfg = H.EvalConfig(runner=runner_lib.RunnerConfig(model=tiny),
                           use_full_runner=True, multi_sbp=multi_sbp,
                           test_len=200, max_motions_per_cat=1)
        hook_calls = []
        mpath = tmp_path / f"eval_{multi_sbp}.jsonl"
        mw = MetricsWriter(str(mpath))
        per_motion, means, maxima = H.evaluate(
            params, cfg, files, log=lambda *a: None,
            viz_hook=lambda f, gt, pred, info: hook_calls.append(info),
            metrics_writer=mw)
        mw.close()
        assert len(per_motion) == 1
        for k in H.METRIC_NAMES:
            assert np.isfinite(means[k]), (k, means)
        results[multi_sbp] = means

        # viz hook received the SBP marker track and the terrain state
        assert len(hook_calls) == 1
        info = hook_calls[0]
        assert info["viz_locs"].ndim == 3 and info["viz_locs"].shape[1:] == (5, 3)
        assert "terrain" in info and "terrain_cfg" in info

        # jsonl schema: one motion record + one summary record
        records = [json.loads(x) for x in open(mpath)]
        kinds = [r["kind"] for r in records]
        assert kinds.count("motion") == 1 and kinds.count("summary") == 1
        motion_rec = records[kinds.index("motion")]
        assert set(H.METRIC_NAMES) <= set(motion_rec)
        summary = records[kinds.index("summary")]
        assert set(H.METRIC_NAMES) <= set(summary["means"])

    # the IK history feedback + pelvis terrain path actually changes the
    # streamed trajectory (it is exercised, not dead-configured)
    diffs = [abs(results[True][k] - results[False][k])
             for k in ("angle_deg", "j_pos_cm")]
    assert max(diffs) > 0, results


def test_gen_data_sharding_partitions_and_is_stable(tmp_path):
    """Multi-host shards partition the job list exactly (no overlap, no
    gaps) and each motion's RNG stream is independent of sharding/resume."""
    from tip_tpu.cli import gen_data as G

    src = tmp_path / "src" / "SubjectA"
    src.mkdir(parents=True)
    for i in range(9):
        np.savez(src / f"take{i}_poses.npz", dummy=np.zeros(1))
    save = str(tmp_path / "out")
    os.makedirs(save, exist_ok=True)

    all_jobs = sorted(d for _, d in G.iter_jobs(str(tmp_path / "src"), save, ""))
    assert len(all_jobs) == 9
    sharded = []
    for k in range(3):
        sharded += [d for _, d in G.iter_jobs(str(tmp_path / "src"), save, "",
                                              shard_index=k, num_shards=3)]
    assert sorted(sharded) == all_jobs
    # resume: existing outputs are skipped without renumbering anything
    open(all_jobs[0], "w").close()
    remaining = [d for _, d in G.iter_jobs(str(tmp_path / "src"), save, "")]
    assert sorted(remaining) == all_jobs[1:]
    # the RNG stream key depends only on the output BASENAME (stable under
    # moving the save dir) and is process-stable (crc32, not the salted
    # builtin hash) — pin an exact value so a hash-fn change that would
    # break resume/shard reproducibility of generated data fails loudly
    import zlib
    base = os.path.basename(all_jobs[3])
    assert G._name_hash(all_jobs[3]) == zlib.crc32(base.encode())
    assert G._name_hash(os.path.join("/elsewhere", base)) \
        == G._name_hash(all_jobs[3])
