"""CLI-level mesh-sharding tests (round-2 VERDICT item #2).

Round-1 gap: --fsdp/--tp changed the mesh shape but no CLI ever placed
params or batches on it — frozen towers were silently replicated and dp was
a no-op.  These tests run the REAL CLI mains on the 8-virtual-device mesh
and assert (a) frozen tower leaves carry non-replicated shardings, (b) the
batch is dp-sharded, and (c) the training loss is invariant across mesh
shapes (dp=8 vs dp=2/fsdp=2/tp=2), i.e. sharding changed the layout, not
the math (reference DDP/FSDP capability, train_legacy.py:314-321).
"""

import re

import jax
import numpy as np
import pytest

CSV_ROWS = """AlphaFoldDB,Full Name,taxon,sequence,function
P10001,Cytochrome c,Homo sapiens,MGDVEKGKKIFIMKCSQCHTVEK,Electron carrier protein.
P10002,Lysozyme C,Gallus gallus,KVFGRCELAAAMKRHGLDNYRGY,Hydrolyzes peptidoglycan.
P10003,Myoglobin,Physeter catodon,MVLSEGEWQLVLHVWAKVEADVA,Oxygen storage protein.
P10004,Ubiquitin,Homo sapiens,MQIFVKTLTGKTITLEVEPSDTI,Protein degradation signal.
"""


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("shard_data") / "train.csv"
    p.write_text(CSV_ROWS)
    return str(p)


def _epoch_loss(capsys):
    out = capsys.readouterr().out
    m = re.search(r"train_loss=([-\d.naninf]+)", out)
    assert m, out
    return float(m.group(1))


def _run_contrast(csv_path, tmp_path, capsys, monkeypatch, fsdp, tp, tag):
    import prot2text_tpu.cli.train_contrast as tc

    seen = {}
    orig_shard = tc.shard_model_params
    orig_place = tc.place_batch

    def spy_shard(mesh, params):
        out = orig_shard(mesh, params)
        seen["frozen"] = out
        return out

    def spy_place(mesh, batch, *a, **kw):
        out = orig_place(mesh, batch, *a, **kw)
        seen.setdefault("batches", []).append(out)
        return out

    monkeypatch.setattr(tc, "shard_model_params", spy_shard)
    monkeypatch.setattr(tc, "place_batch", spy_place)
    tc.main(["--train_csv", csv_path, "--debug_tiny_model", "true",
             "--num_epochs", "1", "--batch_size", "4",
             "--gradient_accumulation_steps", "1", "--model_dtype", "fp32",
             "--attn_impl", "xla", "--fsdp", str(fsdp), "--tp", str(tp),
             "--checkpoint_dir", str(tmp_path / tag)])
    return _epoch_loss(capsys), seen


@pytest.mark.slow
def test_train_contrast_cli_sharding_real_and_loss_invariant(
        csv_path, tmp_path, capsys, monkeypatch):
    assert len(jax.devices()) == 8
    loss_dp, _ = _run_contrast(
        csv_path, tmp_path, capsys, monkeypatch, fsdp=1, tp=1, tag="dp")
    loss_3d, seen = _run_contrast(
        csv_path, tmp_path, capsys, monkeypatch, fsdp=2, tp=2, tag="3d")

    # (a) frozen tower leaves are ACTUALLY sharded, not replicated
    leaves = jax.tree_util.tree_leaves(seen["frozen"])
    sharded = [l for l in leaves
               if l.ndim >= 2 and not l.sharding.is_fully_replicated]
    assert sharded, "no frozen leaf carries a non-replicated sharding"
    # at least one leaf split over fsdp AND one over tp
    specs = {str(l.sharding.spec) for l in sharded}
    assert any("fsdp" in s for s in specs), specs
    assert any("'tp'" in s for s in specs), specs

    # (b) the batch is dp-sharded (batch 4 over dp*fsdp=4)
    batch = seen["batches"][0]
    barr = batch["protein_input_ids"]
    assert not barr.sharding.is_fully_replicated
    assert barr.sharding.shard_shape(barr.shape)[0] == barr.shape[0] // 4

    # (c) same math on both layouts: global-batch InfoNCE (cross-chip
    # negatives) gives the same loss whether the batch lives on 8 dp chips
    # or on the 2x2x2 mesh
    assert np.isfinite(loss_dp) and np.isfinite(loss_3d)
    assert abs(loss_dp - loss_3d) < 5e-4, (loss_dp, loss_3d)


@pytest.mark.slow
def test_train_instruct_cli_sharding_real(csv_path, tmp_path, capsys,
                                          monkeypatch):
    import prot2text_tpu.cli.train_instruct as ti

    seen = {}
    orig_shard = ti.shard_model_params

    def spy_shard(mesh, params):
        out = orig_shard(mesh, params)
        seen["frozen"] = out
        return out

    monkeypatch.setattr(ti, "shard_model_params", spy_shard)
    ti.main(["--train_csv", csv_path, "--debug_tiny_model", "true",
             "--num_epochs", "1", "--batch_size", "4",
             "--gradient_accumulation_steps", "1", "--model_dtype", "fp32",
             "--attn_impl", "xla", "--lora_rank", "2",
             "--fsdp", "2", "--tp", "2",
             "--checkpoint_dir", str(tmp_path / "sft")])
    loss = _epoch_loss(capsys)
    assert np.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(seen["frozen"])
    assert any(l.ndim >= 2 and not l.sharding.is_fully_replicated
               for l in leaves)


@pytest.mark.slow
def test_train_legacy_cli_shards_trainable_params(tmp_path, capsys,
                                                  monkeypatch, csv_path):
    """Full-finetune path: the MODEL params themselves shard over fsdp/tp."""
    import glob

    from prot2text_tpu.data.chat import ByteTextTokenizer
    from prot2text_tpu.data.dataset import Prot2TextInstructDataset
    from tests.test_pdb_graph import make_helix_pdb
    import pandas as pd

    root = str(tmp_path / "root")
    ds = Prot2TextInstructDataset(
        root_dir=root, csv_path=csv_path,
        description_tokenizer=ByteTextTokenizer(),
        skip_download=True, skip_reload=True)
    for uid in pd.read_csv(csv_path)["AlphaFoldDB"]:
        make_helix_pdb(ds.raw_path(uid), n_res=12)
        ds.process_one(uid)
    ds.update_usable_file_names()

    import prot2text_tpu.cli.train_legacy as tl

    seen = {}
    orig = tl.shard_model_params

    def spy(mesh, params):
        out = orig(mesh, params)
        seen.setdefault("trees", []).append(out)
        return out

    monkeypatch.setattr(tl, "shard_model_params", spy)
    tl.main(["--data_root", root, "--train_csv", csv_path,
             "--debug_tiny_model", "true", "--num_epochs", "1",
             "--batch_size", "4", "--model_dtype", "fp32",
             "--attn_impl", "xla", "--fsdp", "2", "--tp", "2",
             "--checkpoint_dir", str(tmp_path / "ck")])
    assert np.isfinite(_epoch_loss(capsys))
    leaves = jax.tree_util.tree_leaves(seen["trees"][0])
    assert any(l.ndim >= 2 and not l.sharding.is_fully_replicated
               for l in leaves)
    assert glob.glob(str(tmp_path / "ck" / "checkpoints_*" / "step_*"))


def test_shard_model_params_auto_disables_batch_wrap(monkeypatch):
    """Advisor r4 (medium): on a batch-axes-only mesh whose weights are
    ACTUALLY fsdp-sharded, the Pallas batch shard_map wrap must
    auto-disable (P2T_NO_SHARD_MAP_BATCH) — a wrapped step would declare
    params replicated and all-gather the full weight set per device per
    step.  A replicated tree must NOT set the flag."""
    import jax.numpy as jnp

    from prot2text_tpu.cli.common import shard_model_params
    from prot2text_tpu.core.mesh import MeshConfig, make_mesh

    monkeypatch.delenv("P2T_NO_SHARD_MAP_BATCH", raising=False)
    mesh = make_mesh(MeshConfig(dp=4, fsdp=2), jax.devices())

    # tiny leaves: no rule shards them -> fully replicated -> no flag
    small = {"layers": {"norm": {"scale": jnp.ones((8,))}}}
    shard_model_params(mesh, small)
    assert "P2T_NO_SHARD_MAP_BATCH" not in __import__("os").environ

    # an embed-named (vocab, hidden) leaf shards over fsdp -> flag set
    big = {"embed_tokens": jnp.ones((64, 16))}
    out = shard_model_params(mesh, big)
    spec = out["embed_tokens"].sharding.spec
    assert any(a is not None for a in spec), spec
    assert __import__("os").environ.get("P2T_NO_SHARD_MAP_BATCH") == "1"
    monkeypatch.delenv("P2T_NO_SHARD_MAP_BATCH", raising=False)
