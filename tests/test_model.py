"""Model parity tests against a torch oracle built from the reference spec.

The oracle below is an independent torch transcription of the reference
architecture (simple_transformer_with_state.py:8-102): linear in-proj,
4-layer post-norm transformer encoder (torch defaults), tanh RNN head.  Our
JAX model must match its eval-mode forward bit-closely after importing the
torch state_dict.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tip_tpu.models import tip_model as M
from tip_tpu.models import losses as L

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class TorchOracle(nn.Module):
    """Reference-spec model (torch). Mirrors TF_RNN_Past_State semantics."""

    def __init__(self, cfg: M.ModelConfig):
        super().__init__()
        extra = 18 if cfg.with_acc_sum else 0
        self.cfg = cfg
        self.in_linear = nn.Linear(cfg.input_size_imu + cfg.size_s + extra,
                                   cfg.tf_in_dim)
        layer = nn.TransformerEncoderLayer(
            d_model=cfg.tf_in_dim, nhead=cfg.n_heads,
            dim_feedforward=cfg.tf_hid_size)
        self.tf_encode = nn.TransformerEncoder(layer, num_layers=cfg.tf_layers)
        self.rnn = nn.RNN(input_size=cfg.tf_in_dim, hidden_size=cfg.rnn_hid_size,
                          num_layers=1, nonlinearity="tanh", batch_first=True,
                          bidirectional=False)
        self.linear = nn.Linear(cfg.rnn_hid_size, cfg.size_s)

    def forward(self, x_imu, x_s):
        cfg = self.cfg
        x_s = x_s.clone()
        x_s[x_s.isnan()] = 0.0
        bs, seq_len = x_imu.size(0), x_imu.size(1)
        x_s[:, :, 18 * 6:18 * 6 + 3] *= 0.0
        x = torch.cat((x_imu, x_s), dim=2)
        x = self.in_linear(x)
        x = x.permute(1, 0, 2)
        mask = torch.triu(torch.ones(seq_len, seq_len) * float("-inf"), diagonal=1)
        x = x.reshape(seq_len, bs, cfg.n_heads, -1)
        x = x.transpose(2, 3).reshape(seq_len, bs, -1)
        x = self.tf_encode(x, mask)
        x = torch.transpose(x, 0, 1)
        hidden = torch.zeros(1, x.size(0), cfg.rnn_hid_size, dtype=x.dtype)
        x, _ = self.rnn(x, hidden)
        return self.linear(x)


CFG = M.ModelConfig(with_acc_sum=True)
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = TorchOracle(CFG).double().eval()
    params = M.params_from_torch_state_dict(oracle.state_dict(), CFG,
                                            dtype=jnp.float64)
    return oracle, params


def _rand_inputs(b=2, t=13):
    x_imu = RNG.normal(size=(b, t, 90))
    x_s = RNG.normal(size=(b, t, 131))
    x_s[0, 0, 5] = np.nan     # NaN handling path
    return x_imu, x_s


def test_forward_matches_torch(oracle_and_params):
    oracle, params = oracle_and_params
    x_imu, x_s = _rand_inputs()
    with torch.no_grad():
        y_ref = oracle(torch.tensor(x_imu), torch.tensor(x_s)).numpy()
    y = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s), CFG))
    np.testing.assert_allclose(y, y_ref, atol=1e-9)


def test_param_count_matches_reference_scale(oracle_and_params):
    oracle, params = oracle_and_params
    n_torch = sum(p.numel() for p in oracle.parameters())
    assert M.param_count(params) == n_torch
    # actual parameter count for the paper config is ~3.68M
    # (4 x ~790k encoder + 394k RNN + in/out projections)
    assert 3.0e6 < n_torch < 4.5e6


def test_causal_no_future_leak(oracle_and_params):
    """Perturbing frame t must not change outputs at frames < t."""
    _, params = oracle_and_params
    x_imu, x_s = _rand_inputs(b=1, t=10)
    y0 = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s), CFG))
    x_imu2 = x_imu.copy()
    x_imu2[:, 7:, :] += 3.0
    y1 = np.asarray(M.forward(params, jnp.asarray(x_imu2), jnp.asarray(x_s), CFG))
    np.testing.assert_allclose(y1[:, :7], y0[:, :7], atol=1e-10)
    assert np.abs(y1[:, 7:] - y0[:, 7:]).max() > 1e-6


def test_left_aligned_padding_equals_short_window(oracle_and_params):
    """Warmup scheme: a length-k window left-aligned in a length-T buffer with
    output read at k-1 must equal running the model on the length-k window.
    (Holds because attention is causal and the RNN starts from zero.)"""
    _, params = oracle_and_params
    k, T = 6, 12
    x_imu, x_s = _rand_inputs(b=1, t=k)
    y_short = np.asarray(M.forward(params, jnp.asarray(x_imu), jnp.asarray(x_s), CFG))

    pad_imu = np.concatenate([x_imu, RNG.normal(size=(1, T - k, 90))], axis=1)
    pad_s = np.concatenate([x_s, RNG.normal(size=(1, T - k, 131))], axis=1)
    y_pad = np.asarray(M.forward(params, jnp.asarray(pad_imu), jnp.asarray(pad_s), CFG))
    np.testing.assert_allclose(y_pad[:, k - 1], y_short[:, k - 1], atol=1e-10)


def test_losses_match_torch_reference_formulas():
    """Losses vs direct torch transcriptions of learning_utils.py:13-78."""
    n, n_sbps = 64, 5
    ra = RNG.normal(size=(n, 111))
    rb = RNG.normal(size=(n, 111))
    ra[:10, -3:] = np.nan      # DIP rows
    # torch reference
    tra, trb = torch.tensor(ra), torch.tensor(rb)
    r2 = ((trb[:, :-3] - tra[:, :-3]) ** 2).mean() * 100.0
    mask = ~torch.any(tra[:, -3:-1].isnan(), dim=1)
    l1 = ((tra[:, -3:-1][mask] - trb[:, -3:-1][mask]) ** 2).mean() * 6.0
    l2 = ((tra[:, -1:][mask] - trb[:, -1:][mask]) ** 2).mean() * 12.0
    expected = (r2 + l1 + l2).item()
    got = float(L.loss_q_only_2axis(jnp.asarray(ra), jnp.asarray(rb)))
    np.testing.assert_allclose(got, expected, rtol=1e-10)

    ca = np.zeros((n, 4 * n_sbps))
    ca[:, 0::4] = RNG.random(size=(n, n_sbps)) > 0.5
    ca[:, 1::4] = RNG.normal(size=(n, n_sbps)) * 0.02
    ca[:, 2::4] = RNG.normal(size=(n, n_sbps)) * 0.02
    ca[:, 3::4] = RNG.normal(size=(n, n_sbps)) * 0.02
    ca[:5] = np.nan
    cb = RNG.normal(size=(n, 4 * n_sbps))
    tca, tcb = torch.tensor(ca), torch.tensor(cb)
    m = ~torch.any(tca.isnan(), dim=1)
    tca_c, tcb_c = tca[m], tcb[m]
    tot = 0.0
    for i in range(n_sbps):
        s = 4 * i
        c_l = torch.nn.functional.binary_cross_entropy(
            torch.sigmoid(tcb_c[:, s:s + 1]), tca_c[:, s:s + 1])
        r_l = ((tcb_c[:, s + 1:s + 4] - tca_c[:, s + 1:s + 4] * 5.0) ** 2).mean()
        tot += (c_l + r_l * 4.0)
    expected_c = (tot / n_sbps * 2.5).item()
    got_c = float(L.loss_constr_multi(jnp.asarray(ca), jnp.asarray(cb), n_sbps))
    np.testing.assert_allclose(got_c, expected_c, rtol=1e-8)

    rj = RNG.normal(size=(4, 20, 108))
    trj = torch.tensor(rj)
    jref = ((trj[:, 3:] - 3 * trj[:, 2:-1] + 3 * trj[:, 1:-2] - trj[:, :-3]) ** 2
            ).mean().item() * 100.0
    np.testing.assert_allclose(float(L.loss_jerk(jnp.asarray(rj))), jref,
                               rtol=1e-10)
