"""Measured-acceptance speculative decoding (scripts/speculative_acceptance_bench.py).

The bench constructs a target that contains the draft as an exact subnetwork
(duplicated-lanes embedding) plus an eps-scaled random upper half — the weight
relationship distillation produces in practice, so the acceptance rate is real
and dialable instead of the chance-level agreement two random models give.
These tests pin the construction's contract at tiny geometry on CPU:

  1. eps=0  -> the target computes exactly the draft's function: measured
              acceptance 1.0 (up to f32 accumulation order), k tokens kept
              per round.
  2. any eps -> speculative greedy == target-only greedy (the speculative
              decoding invariant, through the PRODUCT fused path).
  3. large eps -> acceptance drops well below the eps=0 level (the dial works).

Cf. speculation.rs:42 — the reference's acceptance bookkeeping has no test
with a controlled acceptance rate either; this is rebuild-only coverage.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "speculative_acceptance_bench",
    Path(__file__).resolve().parent.parent / "scripts" /
    "speculative_acceptance_bench.py")
sab = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sab)

D_KWARGS = {"vocab_size": 512, "hidden_size": 64, "num_layers": 2,
            "num_heads": 4, "num_kv_heads": 2, "head_dim": 16,
            "intermediate_size": 128, "max_seq_len": 512}
MAX_NEW = 32


@pytest.fixture(scope="module")
def draft():
    from bench import build_llama_bf16_device
    return build_llama_bf16_device(D_KWARGS, salt0=1)


def _run(draft, eps):
    from kjarni_tpu.generate.sampling import GenerationConfig
    from kjarni_tpu.generate.speculative import SpeculativeGenerator

    d_cfg, d_params = draft
    t_cfg, t_params = sab.build_embedded_target(d_cfg, d_params, eps)
    target = sab.LMShell(t_cfg, t_params, max_context=512)
    dsh = sab.LMShell(d_cfg, d_params, max_context=512)
    prompt = [int(t) for t in
              np.random.default_rng(11).integers(1, 512, 8)]
    cfg = GenerationConfig.greedy(max_new_tokens=MAX_NEW, max_length=512)
    ref = sab.plain_greedy(target, prompt, MAX_NEW)
    target.reset()
    gen = SpeculativeGenerator(target, dsh, num_tokens=4)
    out = [int(t) for t in gen.generate(token_ids=prompt,
                                        config=cfg).split()]
    # asserts internally: equal streams, or one provable near-tie flip
    parity = sab.check_greedy_parity(target, prompt, ref, out)
    return ref, out, gen, parity


def test_exact_subnetwork_accepts_everything(draft):
    ref, out, gen, parity = _run(draft, eps=0.0)
    # bit-exact-grade embedding: every drafted token is the target's token
    assert gen.last_acceptance_rate >= 0.95
    assert parity["parity"] == "exact"
    # full acceptance advances k+1 per round
    assert gen.last_rounds <= -(-MAX_NEW // (gen.k + 1)) + 1


def test_greedy_parity_holds_at_any_acceptance(draft):
    ref, out, _, parity = _run(draft, eps=1.0)
    assert len(out) >= 1
    assert parity["parity"] == "exact"


def test_eps_dials_acceptance_down(draft):
    gen0 = _run(draft, eps=0.0)[2]
    gen1 = _run(draft, eps=1.0)[2]
    assert gen1.last_acceptance_rate < gen0.last_acceptance_rate - 0.3


def test_fmix_builder_decorrelates_lm_head_columns():
    """The acceptance bench replaces the throughput builders' lm_head with
    the fmix32 builder because the single-multiply iota hash emits
    near-duplicate vocab columns at stride V (measured at llama scale:
    top-8 logits exactly tied, |cos| up to 0.99999 between random columns).
    Pin the property the bench depends on: distinct fmix columns are
    decorrelated and a random hidden state produces an untied argmax."""
    from bench import _device_fmix_bf16

    hid, v = 64, 4096
    w = np.asarray(_device_fmix_bf16()((hid, v), 118), np.float32)
    rng = np.random.default_rng(0)
    cols = w[:, rng.choice(v, 400, replace=False)].T
    cols /= np.linalg.norm(cols, axis=1, keepdims=True)
    cos = cols @ cols.T
    np.fill_diagonal(cos, 0.0)
    assert np.abs(cos).max() < 0.9, "fmix lm_head columns are near-duplicates"
    logits = rng.normal(0, 1.0, hid).astype(np.float32) @ w
    top = np.sort(logits)[::-1]
    assert top[0] - top[1] > 1e-4, "fmix argmax is tied"


def test_target_config_doubles_geometry(draft):
    d_cfg, d_params = draft
    t_cfg, t_params = sab.build_embedded_target(d_cfg, d_params, 0.5)
    assert t_cfg.hidden_size == 2 * d_cfg.hidden_size
    assert t_cfg.num_layers == 2 * d_cfg.num_layers
    assert t_cfg.num_heads == 2 * d_cfg.num_heads
    assert t_cfg.num_kv_heads == 2 * d_cfg.num_kv_heads
    assert t_cfg.vocab_size == d_cfg.vocab_size
    assert t_params["embed"].shape == (d_cfg.vocab_size,
                                       2 * d_cfg.hidden_size)
    # upper-half writes carry the eps scale; lower half is the exact draft
    lw = t_params["layers"]["o"]["w"]
    L = d_cfg.num_layers
    q_out = d_cfg.num_heads * d_cfg.head_dim
    assert np.allclose(np.asarray(lw[:L, :q_out, :d_cfg.hidden_size],
                                  dtype=np.float32),
                       np.asarray(d_params["layers"]["o"]["w"],
                                  dtype=np.float32))
