"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY §4:
"multi-chip ... CPU-backend jax tests + mesh shardings")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kjarni_tpu.parallel.mesh import (batch_sharding, cache_sharding, make_mesh,
                                      shard_llama_params)
from kjarni_tpu.parallel.train import causal_lm_loss, sgd_train_step


@pytest.fixture(scope="module")
def tiny_llama():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _random_llama
    cfg, params = _random_llama({
        "num_heads": 8, "num_kv_heads": 4, "head_dim": 16, "hidden_size": 128,
        "intermediate_size": 256, "vocab_size": 256, "max_seq_len": 64,
        "num_layers": 2})
    return cfg, jax.tree.map(jnp.asarray, params)


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh(8, dp=2, tp=4)
        assert m.shape == {"dp": 2, "tp": 4}
        m2 = make_mesh(8)
        assert m2.shape == {"dp": 1, "tp": 8}

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            make_mesh(8, dp=3, tp=3)


class TestShardedForward:
    def test_tp_forward_matches_replicated(self, tiny_llama):
        from kjarni_tpu.models import llama as kllama
        cfg, params = tiny_llama
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)),
                          dtype=jnp.int32)
        ck, cv = kllama.init_cache(cfg, 2, 16)
        ref, _, _ = kllama.forward_all_logits(params, cfg, ids, ck, cv, 0)

        mesh = make_mesh(8, dp=2, tp=4)
        sp = shard_llama_params(params, mesh)
        ids_s = jax.device_put(ids, batch_sharding(mesh))
        ck, cv = kllama.init_cache(cfg, 2, 16)
        ck = jax.device_put(ck, cache_sharding(mesh))
        cv = jax.device_put(cv, cache_sharding(mesh))
        with mesh:
            got, _, _ = jax.jit(
                lambda p, i, a, b: kllama.forward_all_logits(p, cfg, i, a, b, 0)
            )(sp, ids_s, ck, cv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4,
                                   rtol=1e-4)

    def test_sharded_train_step_runs_and_matches(self, tiny_llama):
        cfg, params = tiny_llama
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, 256, (4, 8)), dtype=jnp.int32)
        labels = jnp.asarray(rng.integers(0, 256, (4, 8)), dtype=jnp.int32)
        mask = jnp.ones((4, 8), dtype=jnp.int32)
        ref_loss = float(causal_lm_loss(params, cfg, ids, labels, mask))

        mesh = make_mesh(8, dp=2, tp=4)
        sp = shard_llama_params(params, mesh)
        bs = batch_sharding(mesh)
        with mesh:
            new_params, loss = jax.jit(
                lambda p, i, l, m: sgd_train_step(p, cfg, i, l, m)
            )(sp, jax.device_put(ids, bs), jax.device_put(labels, bs),
              jax.device_put(mask, bs))
        assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
        # params actually changed
        assert not np.allclose(np.asarray(new_params["lm_head"]),
                               np.asarray(params["lm_head"]))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from __graft_entry__ import entry
        fn, args = entry()
        logits, ck, cv = jax.jit(fn)(*args)
        assert logits.shape == (1, 1024)
        assert np.isfinite(np.asarray(logits)).all()

    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)


class TestDataParallelEncode:
    def test_dp_embeddings_match_single_device(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from helpers import tiny_bert_dir
        from kjarni_tpu.models.encoder_models import SentenceEncoder
        from kjarni_tpu.parallel.inference import (encode_data_parallel,
                                                   replicate_params)
        tiny_bert_dir(tmp_path, seed=51)
        enc = SentenceEncoder(tmp_path, dtype="f32")
        texts = [f"hello world doctor {i}" for i in range(10)]  # 10 % 8 != 0
        ref = enc.encode_batch(texts, normalize=True)

        mesh = make_mesh(8, dp=8, tp=1)
        params = replicate_params(enc.params, mesh)
        ids, mask = enc.tokenizer.encode_batch(texts, max_len=enc.max_seq_len)
        got = encode_data_parallel(params, enc.config, mesh, ids, mask)
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestTensorParallelEncoder:
    def test_tp_encoder_matches_replicated(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from helpers import tiny_bert_dir
        from kjarni_tpu.models import bert as kbert
        from kjarni_tpu.models.encoder_models import SentenceEncoder
        from kjarni_tpu.parallel.mesh import (encoder_param_sharding,
                                              _match_structure)
        from jax.sharding import NamedSharding, PartitionSpec as P
        tiny_bert_dir(tmp_path, seed=52)
        enc = SentenceEncoder(tmp_path, dtype="f32")
        ids, mask = enc.tokenizer.encode_batch(["hello world the doctor"],
                                               max_len=enc.max_seq_len)
        tt = np.zeros_like(ids)
        ref = np.asarray(kbert.encode(enc.params, enc.config, jnp.asarray(ids),
                                      jnp.asarray(mask), jnp.asarray(tt)))

        mesh = make_mesh(8, dp=4, tp=2)
        sh = _match_structure(enc.params, encoder_param_sharding(mesh), mesh)
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, s) if x is not None else None,
            enc.params, sh,
            is_leaf=lambda x: x is None or hasattr(x, "shape"))
        with mesh:
            got = np.asarray(jax.jit(
                lambda p, i, m, t: kbert.encode(p, enc.config, i, m, t)
            )(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestSeq2SeqSharding:
    def test_t5_tp_matches_replicated(self, tmp_path):
        import sys, os, json, torch
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from helpers import save_torch_model
        from transformers import T5Config, T5ForConditionalGeneration
        from kjarni_tpu.models import t5 as kt5
        from kjarni_tpu.weights.safetensors_loader import ModelWeights
        from kjarni_tpu.parallel.mesh import shard_params_with, t5_param_sharding

        config = T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                          num_layers=2, num_decoder_layers=2, num_heads=4,
                          relative_attention_num_buckets=8,
                          feed_forward_proj="gated-gelu",
                          tie_word_embeddings=False, decoder_start_token_id=0)
        torch.manual_seed(71)
        save_torch_model(tmp_path, T5ForConditionalGeneration(config).eval(),
                         config)
        hf = json.loads((tmp_path / "config.json").read_text())
        cfg = kt5.T5Config.from_hf(hf)
        params = jax.tree.map(jnp.asarray,
                              kt5.load_params(ModelWeights(tmp_path), cfg))
        enc_ids = jnp.asarray(np.array([[5, 9, 23, 1]], dtype=np.int32))
        enc_mask = jnp.ones_like(enc_ids)
        dec_ids = jnp.asarray(np.array([[0, 42, 17]], dtype=np.int32))

        def full(params):
            enc = kt5.encode(params, cfg, enc_ids, enc_mask)
            ck, cv = kt5.precompute_cross_kv(params, cfg, enc)
            sk, sv = kt5.init_self_cache(cfg, 1, 8)
            logits, _, _ = kt5.decode_step(params, cfg, dec_ids, sk, sv, ck, cv,
                                           enc_mask, 0)
            return logits

        ref = np.asarray(full(params))
        mesh = make_mesh(8, dp=2, tp=4)
        sp = shard_params_with(params, t5_param_sharding(mesh), mesh)
        with mesh:
            got = np.asarray(jax.jit(full)(sp))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_bart_tp_matches_replicated(self, tmp_path):
        import sys, os, json, torch
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from helpers import save_torch_model
        from transformers import BartConfig, BartForConditionalGeneration
        from kjarni_tpu.models import bart as kbart
        from kjarni_tpu.weights.safetensors_loader import ModelWeights
        from kjarni_tpu.parallel.mesh import (bart_param_sharding,
                                              shard_params_with)
        config = BartConfig(vocab_size=96, d_model=32, encoder_layers=1,
                            decoder_layers=1, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=64,
                            pad_token_id=1, bos_token_id=0, eos_token_id=2,
                            decoder_start_token_id=2)
        torch.manual_seed(72)
        save_torch_model(tmp_path, BartForConditionalGeneration(config).eval(),
                         config)
        hf = json.loads((tmp_path / "config.json").read_text())
        cfg = kbart.BartConfig.from_hf(hf)
        params = jax.tree.map(jnp.asarray,
                              kbart.load_params(ModelWeights(tmp_path), cfg))
        enc_ids = jnp.asarray(np.array([[0, 5, 9, 2]], dtype=np.int32))
        enc_mask = jnp.ones_like(enc_ids)
        dec_ids = jnp.asarray(np.array([[2, 0, 42]], dtype=np.int32))

        def full(params):
            enc = kbart.encode(params, cfg, enc_ids, enc_mask)
            ck, cv = kbart.precompute_cross_kv(params, cfg, enc)
            sk, sv = kbart.init_self_cache(cfg, 1, 8)
            logits, _, _ = kbart.decode_step(params, cfg, dec_ids, sk, sv,
                                             ck, cv, enc_mask, 0)
            return logits

        ref = np.asarray(full(params))
        mesh = make_mesh(8, dp=2, tp=4)
        sp = shard_params_with(params, bart_param_sharding(mesh), mesh)
        with mesh:
            got = np.asarray(jax.jit(full)(sp))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class TestPipelineParallel:
    """GPipe pipeline over the "pp" axis (parallel/pipeline.py)."""

    def test_pp_forward_matches_single_device(self, tiny_llama):
        from kjarni_tpu.models import llama as kllama
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh,
                                                  pipeline_forward,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = tiny_llama  # 2 layers -> pp=2, one layer per stage
        ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (4, 8)),
                          dtype=jnp.int32)
        ck, cv = kllama.init_cache(cfg, 4, 8)
        ref, _, _ = kllama.forward_all_logits(params, cfg, ids, ck, cv, 0)

        mesh = make_pp_mesh(2, pp=2)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        with mesh:
            got = pipeline_forward(sharded, cfg, ids, mesh, n_micro=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_pp_more_microbatches_than_stages(self, tiny_llama):
        from kjarni_tpu.models import llama as kllama
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh,
                                                  pipeline_forward,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = tiny_llama
        ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (8, 8)),
                          dtype=jnp.int32)
        ck, cv = kllama.init_cache(cfg, 8, 8)
        ref, _, _ = kllama.forward_all_logits(params, cfg, ids, ck, cv, 0)
        mesh = make_pp_mesh(2, pp=2)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        with mesh:
            got = pipeline_forward(sharded, cfg, ids, mesh, n_micro=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


    def test_pp4_four_stages(self):
        """Four pipeline stages, one layer each, bubble = 3 steps."""
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from __graft_entry__ import _random_llama
        from kjarni_tpu.models import llama as kllama
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh,
                                                  pipeline_forward,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = _random_llama({
            "num_heads": 8, "num_kv_heads": 4, "head_dim": 16,
            "hidden_size": 128, "intermediate_size": 256, "vocab_size": 256,
            "max_seq_len": 64, "num_layers": 4})
        params = jax.tree.map(jnp.asarray, params)
        ids = jnp.asarray(np.random.default_rng(6).integers(0, 256, (8, 8)),
                          dtype=jnp.int32)
        ck, cv = kllama.init_cache(cfg, 8, 8)
        ref, _, _ = kllama.forward_all_logits(params, cfg, ids, ck, cv, 0)
        mesh = make_pp_mesh(4, pp=4)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        with mesh:
            got = pipeline_forward(sharded, cfg, ids, mesh, n_micro=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def _greedy_reference(cfg, params, ids, max_new):
    """Single-device batched greedy decode (no EOS stop), [B, max_new]."""
    from kjarni_tpu.models import llama as kllama
    B, S = ids.shape
    ck, cv = kllama.init_cache(cfg, B, S + max_new)
    logits, ck, cv = kllama.forward(params, cfg, ids, ck, cv, 0)
    toks = [jnp.argmax(logits, axis=-1).astype(jnp.int32)]
    for j in range(max_new - 1):
        logits, ck, cv = kllama.forward(params, cfg, toks[-1][:, None],
                                        ck, cv, S + j)
        toks.append(jnp.argmax(logits, axis=-1).astype(jnp.int32))
    return np.stack([np.asarray(t) for t in toks], axis=1)


class TestPipelineDecode:
    """pp_generate: GPipe ring decode WITH per-stage KV caches — the sampled
    token's embedding wraps last-stage -> stage-0 over ppermute."""

    def test_pp_generate_matches_single_device(self, tiny_llama):
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh, pp_generate,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = tiny_llama  # 2 layers -> pp=2, one layer per stage
        ids = jnp.asarray(np.random.default_rng(7).integers(0, 256, (4, 8)),
                          dtype=jnp.int32)
        ref = _greedy_reference(cfg, params, ids, max_new=6)
        mesh = make_pp_mesh(2, pp=2)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        with mesh:
            got = pp_generate(sharded, cfg, ids, mesh, max_new=6)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_pp4_generate_four_stages(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from __graft_entry__ import _random_llama
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh, pp_generate,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = _random_llama({
            "num_heads": 8, "num_kv_heads": 4, "head_dim": 16,
            "hidden_size": 128, "intermediate_size": 256, "vocab_size": 256,
            "max_seq_len": 64, "num_layers": 4})
        params = jax.tree.map(jnp.asarray, params)
        ids = jnp.asarray(np.random.default_rng(8).integers(0, 256, (8, 8)),
                          dtype=jnp.int32)
        ref = _greedy_reference(cfg, params, ids, max_new=5)
        mesh = make_pp_mesh(4, pp=4)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        with mesh:
            got = pp_generate(sharded, cfg, ids, mesh, max_new=5)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_pp_generate_single_token(self, tiny_llama):
        """max_new=1 skips the ring-decode phase entirely (prefill only)."""
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh, pp_generate,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = tiny_llama
        ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (2, 8)),
                          dtype=jnp.int32)
        ref = _greedy_reference(cfg, params, ids, max_new=1)
        mesh = make_pp_mesh(2, pp=2)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        with mesh:
            got = pp_generate(sharded, cfg, ids, mesh, max_new=1)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_pp_generate_rejects_indivisible_batch(self, tiny_llama):
        from kjarni_tpu.parallel.pipeline import (make_pp_mesh, pp_generate,
                                                  pp_param_sharding)
        from kjarni_tpu.parallel.mesh import shard_params_with
        cfg, params = tiny_llama
        mesh = make_pp_mesh(2, pp=2)
        sharded = shard_params_with(params, pp_param_sharding(mesh), mesh)
        ids = jnp.zeros((3, 8), jnp.int32)
        with pytest.raises(ValueError, match="microbatches"):
            with mesh:
                pp_generate(sharded, cfg, ids, mesh, max_new=4)


class TestSequenceParallel:
    """Ulysses-style sp prefill (parallel/sequence.py)."""

    def test_sp_forward_matches_single_device(self, tiny_llama):
        from kjarni_tpu.models import llama as kllama
        from kjarni_tpu.parallel.sequence import (make_sp_mesh,
                                                  sequence_parallel_forward)
        cfg, params = tiny_llama  # heads 8, kv 4 -> sp=4 divides both
        ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (2, 16)),
                          dtype=jnp.int32)
        ck, cv = kllama.init_cache(cfg, 2, 16)
        ref, _, _ = kllama.forward_all_logits(params, cfg, ids, ck, cv, 0)
        mesh = make_sp_mesh(4)
        got = sequence_parallel_forward(params, cfg, ids, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_sp_rejects_indivisible(self, tiny_llama):
        from kjarni_tpu.parallel.sequence import (make_sp_mesh,
                                                  sequence_parallel_forward)
        cfg, params = tiny_llama
        mesh = make_sp_mesh(8)  # kv heads 4 do not divide 8
        ids = jnp.zeros((1, 16), jnp.int32)
        with pytest.raises(ValueError):
            sequence_parallel_forward(params, cfg, ids, mesh)
