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


def test_two_host_loader_alignment_and_dp_axis():
    """Simulated 2-host input pipeline (VERDICT round-1 item #10):
    two ShardedSampler instances (one per process) must (a) emit the SAME
    number of batches per epoch (hosts stay collective-aligned step for
    step), (b) partition one (seed, epoch)-keyed global permutation, and
    (c) concatenating the per-host batches reproduces exactly the global
    dp batch the jitted step shards over the mesh's data axes."""
    from prot2text_tpu.data.sampler import DataLoader, ShardedSampler

    N, bsz = 37, 4  # awkward size: drop_last trims to a host-even count
    data = [{"i": np.asarray([i])} for i in range(N)]

    def collate(recs):
        return {"i": np.concatenate([r["i"] for r in recs])}

    loaders = [
        DataLoader(dataset=data, collate_fn=collate, batch_size=bsz,
                   sampler=ShardedSampler(N, num_shards=2, shard_index=h,
                                          seed=5))
        for h in range(2)
    ]
    for ld in loaders:
        ld.set_epoch(2)
    # (a) equal step counts
    b0, b1 = list(loaders[0]), list(loaders[1])
    assert len(b0) == len(b1) == len(loaders[0]) == len(loaders[1])
    # (b) both hosts are strided slices of ONE global permutation
    rng = np.random.default_rng((5, 2))
    perm = np.arange(N)
    rng.shuffle(perm)
    perm = perm[: (N // 2) * 2]
    got0 = np.concatenate([b["i"] for b in b0])
    got1 = np.concatenate([b["i"] for b in b1])
    np.testing.assert_array_equal(got0, perm[0::2][: len(got0)])
    np.testing.assert_array_equal(got1, perm[1::2][: len(got1)])
    assert not set(got0.tolist()) & set(got1.tolist())
    # (c) global batch = concat of per-host batches, dp-sharded on the mesh:
    # per-host rows occupy contiguous dp coordinates, so host h feeds the
    # devices whose dp index is in [h*bsz, (h+1)*bsz) for that step — the
    # same layout jax.make_array_from_process_local_data produces multi-host
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from prot2text_tpu.core.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=-1, fsdp=1, tp=1))  # 8 virtual devices
    global_batch = np.concatenate([b0[0]["i"], b1[0]["i"]])  # (8,)
    arr = jax.device_put(global_batch,
                         NamedSharding(mesh, P(("dp", "fsdp"))))
    assert not arr.sharding.is_fully_replicated
    for shard in arr.addressable_shards:
        dp_coord = shard.index[0].start
        np.testing.assert_array_equal(
            np.asarray(shard.data), global_batch[dp_coord:dp_coord + 1])
    # first 4 dp coords carry host-0 rows, last 4 host-1 rows
    np.testing.assert_array_equal(global_batch[:4], b0[0]["i"])
    np.testing.assert_array_equal(global_batch[4:], b1[0]["i"])


# --- DataLoader worker processes (reference torch num_workers,
#     train_contrast.py:584-609) ---

class _SquareDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"i": np.int64(i), "sq": np.int64(i * i)}


def _pid_collate(items):
    import os

    return {"i": np.stack([it["i"] for it in items]),
            "sq": np.stack([it["sq"] for it in items]),
            "pid": np.int64(os.getpid())}


def test_worker_pool_loader_matches_inline():
    """num_workers>0 must yield identical batches in identical order to the
    inline path, with fetch+collate running in separate processes."""
    import os

    from prot2text_tpu.data.sampler import DataLoader, ShardedSampler

    ds = _SquareDataset(37)
    kw = dict(dataset=ds, collate_fn=_pid_collate, batch_size=4,
              sampler=ShardedSampler(len(ds), shuffle=True, seed=3),
              drop_last=False)
    inline = list(DataLoader(**kw))
    pooled_loader = DataLoader(**kw, num_workers=2)
    pooled = list(pooled_loader)
    assert len(pooled) == len(inline) == 10
    for a, b in zip(inline, pooled):
        np.testing.assert_array_equal(a["i"], b["i"])
        np.testing.assert_array_equal(a["sq"], b["sq"])
    # collation really happened in worker processes
    worker_pids = {int(b["pid"]) for b in pooled}
    assert os.getpid() not in worker_pids
    assert 1 <= len(worker_pids) <= 2
    # second epoch reuses the pool and reshuffles
    pooled_loader.set_epoch(1)
    inline_e1_loader = DataLoader(**kw)
    inline_e1_loader.set_epoch(1)
    e1_inline = list(inline_e1_loader)
    e1_pooled = list(pooled_loader)
    for a, b in zip(e1_inline, e1_pooled):
        np.testing.assert_array_equal(a["i"], b["i"])
    assert not np.array_equal(e1_pooled[0]["i"], pooled[0]["i"])
    pooled_loader.shutdown()
