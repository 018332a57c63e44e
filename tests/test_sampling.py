"""Sampling-path tests: temperature/top-k/top-p semantics and the adapter
torch-checkpoint importer (parity with the reference ModalityAdapter,
including its applied-vs-deprecated sublayer split)."""

import numpy as np

import jax
import jax.numpy as jnp

from prot2text_tpu.infer.generate import GenerationConfig, _sample_token


def test_topk1_equals_greedy():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 50)).astype(np.float32))
    greedy = _sample_token(logits, GenerationConfig(do_sample=False),
                           jax.random.PRNGKey(0))
    topk1 = _sample_token(
        logits, GenerationConfig(do_sample=True, top_k=1, temperature=1.0),
        jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(topk1))


def test_low_temperature_concentrates():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((1, 20)).astype(np.float32))
    cfg = GenerationConfig(do_sample=True, temperature=1e-4)
    samples = {int(_sample_token(logits, cfg, jax.random.PRNGKey(i))[0])
               for i in range(10)}
    assert samples == {int(jnp.argmax(logits[0]))}


def test_top_p_masks_tail():
    # distribution: p = [0.6, 0.3, 0.05, ...]; top_p=0.8 keeps tokens 0,1
    probs = np.array([[0.6, 0.3, 0.05, 0.03, 0.02]], np.float32)
    logits = jnp.asarray(np.log(probs))
    cfg = GenerationConfig(do_sample=True, top_p=0.8, temperature=1.0)
    seen = {int(_sample_token(logits, cfg, jax.random.PRNGKey(i))[0])
            for i in range(200)}
    assert seen <= {0, 1}
    assert 0 in seen and 1 in seen


def test_top_k_masks_tail():
    probs = np.array([[0.4, 0.3, 0.2, 0.08, 0.02]], np.float32)
    logits = jnp.asarray(np.log(probs))
    cfg = GenerationConfig(do_sample=True, top_k=2, temperature=1.0)
    seen = {int(_sample_token(logits, cfg, jax.random.PRNGKey(i))[0])
            for i in range(200)}
    assert seen <= {0, 1}


def test_adapter_torch_import_matches_reference_module():
    import torch

    from prot2text_tpu.models.adapters import (
        ModalityAdapterConfig, modality_adapter,
        modality_adapter_params_from_torch,
    )

    torch.manual_seed(0)
    fc1 = torch.nn.Linear(16, 24)
    fc2 = torch.nn.Linear(24, 8)
    # reference state dict includes deprecated ln1/ln2 keys
    sd = {
        "fc1.weight": fc1.weight, "fc1.bias": fc1.bias,
        "fc2.weight": fc2.weight, "fc2.bias": fc2.bias,
        "ln1.weight": torch.ones(24), "ln1.bias": torch.zeros(24),
        "ln2.weight": torch.ones(8), "ln2.bias": torch.zeros(8),
    }
    params = modality_adapter_params_from_torch(sd)
    cfg = ModalityAdapterConfig(16, 24, 8, dropout_rate=0.0)

    x = torch.randn(2, 5, 16)
    with torch.no_grad():
        h = torch.nn.functional.gelu(fc1(x))
        h = torch.nn.functional.gelu(fc2(h))
        ref = torch.nn.functional.normalize(h, p=2, dim=-1).numpy()
    out = np.asarray(modality_adapter(cfg, params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_sampler_shards_are_disjoint_and_cover():
    from prot2text_tpu.data.sampler import ShardedSampler

    shards = [
        ShardedSampler(103, num_shards=4, shard_index=i, seed=7)
        for i in range(4)
    ]
    all_idx = np.concatenate([s.epoch_indices(3) for s in shards])
    assert len(all_idx) == 100  # drop_last: 103 -> 100 divisible
    assert len(set(all_idx.tolist())) == 100
    # different epoch -> different permutation
    assert not np.array_equal(shards[0].epoch_indices(3),
                              shards[0].epoch_indices(4))


def test_cosine_per_epoch_schedule_is_stepwise():
    from prot2text_tpu.train.optim import cosine_warmup_schedule

    sched = cosine_warmup_schedule(1e-3, total_steps=10, warmup_frac=0.1,
                                   steps_per_period=5)
    # constant within an epoch (5 steps), changes across epochs
    assert float(sched(0)) == float(sched(4))
    assert float(sched(5)) != float(sched(4))


def test_prefetch_preserves_order_and_exhausts():
    from prot2text_tpu.data.sampler import prefetch

    items = list(prefetch(iter(range(17)), size=3))
    assert items == list(range(17))


def test_run_generation_dispatches_beams():
    import jax

    from prot2text_tpu.infer.generate import GenerationConfig, run_generation
    from prot2text_tpu.models.decoder import init_decoder_params
    from prot2text_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig.tiny(vocab_size=64).core()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.standard_normal((2, 5, cfg.hidden_size))
                      .astype(np.float32))
    mask = jnp.ones((2, 5), jnp.int32)
    greedy = run_generation(
        cfg, params, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=GenerationConfig(max_new_tokens=4, eos_token_id=63,
                                 pad_token_id=62))
    beams = run_generation(
        cfg, params, inputs_embeds=emb, attention_mask=mask,
        gen_cfg=GenerationConfig(max_new_tokens=4, eos_token_id=63,
                                 pad_token_id=62, num_beams=3))
    assert np.asarray(greedy).shape == np.asarray(beams).shape == (2, 4)
    # beam score(sum logp of beam seq) >= greedy's by construction


def test_sampler_tiny_dataset_many_shards():
    from prot2text_tpu.data.sampler import ShardedSampler

    # dataset smaller than the shard count must still give every shard work
    shards = [ShardedSampler(3, num_shards=8, shard_index=i, shuffle=False,
                             drop_last=False) for i in range(8)]
    sizes = [len(s.epoch_indices(0)) for s in shards]
    assert sizes == [1] * 8


def test_filter_logits_matches_hf_warpers():
    """Distribution-level parity vs transformers' warper pipeline on fixed
    logits (VERDICT round-1 item #9): temperature → top-k → top-p in HF
    processor order, including boundary-token tie handling."""
    import torch
    from transformers.generation.logits_process import (
        LogitsProcessorList, TemperatureLogitsWarper, TopKLogitsWarper,
        TopPLogitsWarper,
    )

    from prot2text_tpu.infer.generate import filter_logits

    rng = np.random.default_rng(123)
    base = rng.standard_normal((5, 64)).astype(np.float32) * 2.0
    # adversarial rows: exact ties at the top-p boundary and repeated values
    base[1] = np.repeat(np.linspace(3, -3, 8).astype(np.float32), 8)
    base[2, :] = 0.0
    base[2, 7] = 5.0

    cases = [
        dict(temperature=0.7, top_k=None, top_p=None),
        dict(temperature=1.0, top_k=10, top_p=None),
        dict(temperature=1.0, top_k=None, top_p=0.9),
        dict(temperature=0.8, top_k=12, top_p=0.7),
        dict(temperature=2.5, top_k=5, top_p=0.95),
    ]
    ids = torch.zeros((5, 1), dtype=torch.long)
    for case in cases:
        procs = LogitsProcessorList()
        if case["temperature"] != 1.0:
            procs.append(TemperatureLogitsWarper(case["temperature"]))
        if case["top_k"]:
            procs.append(TopKLogitsWarper(case["top_k"]))
        if case["top_p"]:
            procs.append(TopPLogitsWarper(case["top_p"]))
        want = procs(ids, torch.as_tensor(base.copy())).numpy()

        cfg = GenerationConfig(do_sample=True, **case)
        got = np.asarray(filter_logits(jnp.asarray(base), cfg))

        want_mask = np.isfinite(want)
        got_mask = np.isfinite(got)
        # kept-set SIZE always matches; exact kept indices match whenever
        # the row has no duplicate values (HF's tie order at the top-p
        # boundary comes from torch.sort's unspecified tie behavior, so
        # index-level tie resolution is not a contract)
        np.testing.assert_array_equal(got_mask.sum(-1), want_mask.sum(-1),
                                      err_msg=str(case))
        for r in range(base.shape[0]):
            if len(np.unique(base[r])) == base.shape[1]:
                np.testing.assert_array_equal(
                    got_mask[r], want_mask[r], err_msg=f"{case} row {r}")

        # renormalized distributions over the kept VALUES agree (compare
        # value-sorted to be tie-order agnostic)
        def _softmax(x):
            x = np.where(np.isfinite(x), x, -1e30)
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        np.testing.assert_allclose(
            np.sort(_softmax(got), axis=-1), np.sort(_softmax(want), axis=-1),
            rtol=1e-5, atol=1e-6, err_msg=str(case))
