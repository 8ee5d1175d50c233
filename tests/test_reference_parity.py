"""Bit-parity against the ACTUAL reference model module.

tests/test_model.py proves parity against a re-transcribed torch oracle;
this file closes the "transcription error in the oracle" loophole by
importing /root/reference/simple_transformer_with_state.py itself (it
depends only on torch) and checking state-dict import -> forward parity at
the full paper configuration.

The stochastic train-mode path (in_dropout / past_state_dropout, reference
forward :73,77) cannot be matched sample-for-sample — torch and JAX draw
from different RNG streams — so it is covered behaviourally instead:
determinism under a fixed JAX key and divergence across keys.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference/simple_transformer_with_state.py"


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_tf_rnn", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


pytestmark = pytest.mark.skipif(not os.path.exists(REF_PATH),
                                reason="reference mount not present")

# full paper configuration (reference train_model.py:21-74, README step 4)
CFG = M.ModelConfig(input_size_imu=72, size_s=131, with_acc_sum=True,
                    tf_in_dim=256, tf_hid_size=1024, n_heads=16, tf_layers=4,
                    rnn_hid_size=512)


@pytest.fixture(scope="module")
def ref_and_params():
    # the reference allocates its RNN hidden state with torch's *default*
    # dtype inside forward (ref :98), so f64 parity needs the default set
    mod = _load_reference_module()
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        torch.manual_seed(5104)
        # NOTE: the reference constructs nn.Dropout(past_state_dropout)
        # INLINE in forward (ref :73,77) — a freshly constructed module is
        # always in train mode, so .eval() never disables it and the
        # reference has no deterministic inference path at p>0.  The
        # deterministic parity check therefore constructs with p=0 (identical
        # weights/architecture); the stochastic path is covered behaviourally
        # below.
        ref = mod.TF_RNN_Past_State(
            input_size_imu=CFG.input_size_imu, size_s=CFG.size_s,
            rnn_hid_size=CFG.rnn_hid_size, tf_hid_size=CFG.tf_hid_size,
            tf_in_dim=CFG.tf_in_dim, n_heads=CFG.n_heads,
            tf_layers=CFG.tf_layers, dropout=0.1, in_dropout=0.0,
            past_state_dropout=0.0, with_rnn=True, with_acc_sum=True)
        ref = ref.eval()
    finally:
        torch.set_default_dtype(old)
    params = M.params_from_torch_state_dict(ref.state_dict(), CFG,
                                            dtype=jnp.float64)
    return ref, params


def _ref_forward(ref, x_imu, x_s):
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            return ref(torch.tensor(x_imu), torch.tensor(x_s)).numpy()
    finally:
        torch.set_default_dtype(old)


def _inputs(b=2, t=40, seed=11):
    rng = np.random.default_rng(seed)
    x_imu = rng.normal(size=(b, t, 90))
    x_s = rng.normal(size=(b, t, 131)) * 0.3
    x_s[0, :3, 7] = np.nan          # exercise the NaN path (ref :65)
    return x_imu, x_s


def test_forward_parity_with_actual_reference_module(ref_and_params):
    ref, params = ref_and_params
    x_imu, x_s = _inputs()
    y_ref = _ref_forward(ref, x_imu, x_s)
    y = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s),
                             CFG))
    np.testing.assert_allclose(y, y_ref, atol=1e-9)


def test_param_count_matches_actual_reference(ref_and_params):
    ref, params = ref_and_params
    assert M.param_count(params) == sum(p.numel() for p in ref.parameters())


def test_short_window_parity(ref_and_params):
    """The streaming runner feeds variable-length (<40) windows during
    warmup; parity must hold there too."""
    ref, params = ref_and_params
    x_imu, x_s = _inputs(b=1, t=7, seed=12)
    y_ref = _ref_forward(ref, x_imu, x_s)
    y = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s),
                             CFG))
    np.testing.assert_allclose(y, y_ref, atol=1e-9)


def test_train_mode_stochastic_path(ref_and_params):
    """Train-mode dropout: deterministic per key, different across keys, and
    the heavy past-state dropout (p=0.8) actually perturbs the output."""
    _, params = ref_and_params
    x_imu, x_s = _inputs(b=1, t=8, seed=13)
    args = (params, jnp.asarray(x_imu), jnp.asarray(x_s), CFG)
    y_eval = np.asarray(M.forward(*args))
    y_a = np.asarray(M.forward(*args, train=True, rng=jax.random.PRNGKey(0)))
    y_a2 = np.asarray(M.forward(*args, train=True, rng=jax.random.PRNGKey(0)))
    y_b = np.asarray(M.forward(*args, train=True, rng=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(y_a, y_a2)
    assert np.abs(y_a - y_b).max() > 1e-6
    assert np.abs(y_a - y_eval).max() > 1e-6
