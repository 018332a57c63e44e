"""End-to-end CLI tests on the 8-device CPU mesh with tiny models and the
offline byte tokenizer — the smoke-test role of the reference's
--debug_trim_* flags (SURVEY.md §4), but automated."""

import glob
import json
import os

import numpy as np
import pytest

CSV_ROWS = """AlphaFoldDB,Full Name,taxon,sequence,function
P00001,Cytochrome c,Homo sapiens,MGDVEKGKKIFIMKCSQCHTVEK,Electron carrier protein.
P00002,Lysozyme C,Gallus gallus,KVFGRCELAAAMKRHGLDNYRGY,Hydrolyzes peptidoglycan.
P00003,Myoglobin,Physeter catodon,MVLSEGEWQLVLHVWAKVEADVA,Oxygen storage protein.
P00004,Ubiquitin,Homo sapiens,MQIFVKTLTGKTITLEVEPSDTI,Protein degradation signal.
"""


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "train.csv"
    p.write_text(CSV_ROWS)
    return str(p)


@pytest.mark.slow
def test_train_contrast_cli(csv_path, tmp_path):
    from prot2text_tpu.cli.train_contrast import main

    main(["--train_csv", csv_path, "--debug_tiny_model", "true",
          "--num_epochs", "1", "--batch_size", "2",
          "--gradient_accumulation_steps", "2", "--model_dtype", "fp32",
          "--attn_impl", "xla", "--checkpoint_dir", str(tmp_path)])
    assert glob.glob(str(tmp_path / "checkpoints_*" / "step_*"))


@pytest.mark.slow
def test_sft_generate_benchmark_cli(csv_path, tmp_path):
    from prot2text_tpu.cli.benchmark import main as bench_main
    from prot2text_tpu.cli.generate_instruct_light import main as gen_main
    from prot2text_tpu.cli.train_instruct import main as sft_main

    sft_main(["--train_csv", csv_path, "--debug_tiny_model", "true",
              "--num_epochs", "1", "--batch_size", "2",
              "--gradient_accumulation_steps", "1", "--model_dtype", "fp32",
              "--attn_impl", "xla", "--lora_rank", "2",
              "--checkpoint_dir", str(tmp_path / "ckpt")])
    ckpt = sorted(glob.glob(str(tmp_path / "ckpt" / "checkpoints_*")))[-1]

    gen_main(["--test_csv", csv_path, "--debug_tiny_model", "true",
              "--model_dtype", "fp32", "--attn_impl", "xla",
              "--lora_rank", "2", "--load_sft_checkpoint_dir", ckpt,
              "--batch_size", "2", "--max_new_tokens", "4",
              "--output_dir", str(tmp_path / "results")])
    out = glob.glob(str(tmp_path / "results" / "*.json"))
    assert out
    data = json.load(open(out[0]))
    assert len(data) == 4
    assert all("true" in v and "pred" in v for v in data.values())

    metrics = bench_main(["--results_dir", str(tmp_path / "results"),
                          "--identifier", "light"])
    assert "exact_match" in metrics and "bleu4" in metrics


@pytest.fixture(scope="module")
def instruct_root(tmp_path_factory, csv_path):
    """Preprocessed instruct-dataset root built through the REAL pipeline
    (featurizer + chat composition) on synthetic helix PDBs."""
    from prot2text_tpu.data.chat import ByteTextTokenizer
    from prot2text_tpu.data.dataset import Prot2TextInstructDataset
    from tests.test_pdb_graph import make_helix_pdb

    root = str(tmp_path_factory.mktemp("instruct_root"))
    ds = Prot2TextInstructDataset(
        root_dir=root, csv_path=csv_path,
        description_tokenizer=ByteTextTokenizer(),
        skip_download=True, skip_reload=True)
    import pandas as pd

    for uid in pd.read_csv(csv_path)["AlphaFoldDB"]:
        make_helix_pdb(ds.raw_path(uid), n_res=12)
        ds.process_one(uid)
    ds.update_usable_file_names()
    assert len(ds) == 4
    return root


def test_instruct_dataset_records(instruct_root, csv_path):
    from prot2text_tpu.data.chat import ByteTextTokenizer
    from prot2text_tpu.data.dataset import Prot2TextInstructDataset

    tok = ByteTextTokenizer()
    ds = Prot2TextInstructDataset(
        root_dir=instruct_root, csv_path=csv_path,
        description_tokenizer=tok, skip_download=True, skip_reload=True)
    rec = ds[0]
    assert rec["x"].shape[0] == 12
    assert rec["edge_index"].shape[0] == 2
    # placeholder count in prompt == len(helix seq) + 2 ... the chat uses the
    # CSV sequence length (not the PDB), trimmed: len(seq)+2
    n_ph = (rec["prompt_input_ids"] == tok.placeholder_id).sum()
    assert n_ph == 23 + 2
    # description ends with eos
    assert rec["description_input_ids"][-1] == tok.eos_token_id


@pytest.mark.slow
def test_train_legacy_and_generate_cli(instruct_root, csv_path, tmp_path):
    from prot2text_tpu.cli.generate_legacy import main as gen_main
    from prot2text_tpu.cli.train_legacy import main as train_main

    train_main(["--data_root", instruct_root, "--train_csv", csv_path,
                "--debug_tiny_model", "true", "--num_epochs", "1",
                "--batch_size", "2", "--model_dtype", "fp32",
                "--attn_impl", "xla",
                "--checkpoint_dir", str(tmp_path / "ck")])
    ckpt_root = sorted(glob.glob(str(tmp_path / "ck" / "checkpoints_*")))[-1]

    gen_main(["--data_root", instruct_root, "--test_csv", csv_path,
              "--debug_tiny_model", "true", "--model_dtype", "fp32",
              "--attn_impl", "xla", "--batch_size", "2",
              "--max_new_tokens", "4", "--load_checkpoint_dir", ckpt_root,
              "--output_dir", str(tmp_path / "res")])
    out = glob.glob(str(tmp_path / "res" / "*legacy*.json"))
    assert out and len(json.load(open(out[0]))) == 4


@pytest.mark.slow
def test_generate_instruct_cli_with_graph(instruct_root, csv_path, tmp_path):
    from prot2text_tpu.cli.generate_instruct import main as gen_main

    gen_main(["--data_root", instruct_root, "--test_csv", csv_path,
              "--debug_tiny_model", "true", "--model_dtype", "fp32",
              "--attn_impl", "xla", "--batch_size", "2",
              "--max_new_tokens", "4", "--use_graph", "true",
              "--edge_budget", "512",
              "--output_dir", str(tmp_path / "res2")])
    out = glob.glob(str(tmp_path / "res2" / "*instruct*.json"))
    assert out and len(json.load(open(out[0]))) == 4


def test_generate_instruct_cli_prompt_lookup_matches_plain(
        instruct_root, csv_path, tmp_path):
    """--prompt_lookup_tokens through the composed-model generate() surface
    must reproduce plain greedy predictions exactly (same seeded model)."""
    from prot2text_tpu.cli.generate_instruct import main as gen_main

    common = ["--data_root", instruct_root, "--test_csv", csv_path,
              "--debug_tiny_model", "true", "--model_dtype", "fp32",
              "--attn_impl", "xla", "--batch_size", "2",
              "--max_new_tokens", "6"]
    gen_main(common + ["--output_dir", str(tmp_path / "plain")])
    gen_main(common + ["--prompt_lookup_tokens", "3",
                       "--output_dir", str(tmp_path / "pld")])
    plain = json.load(open(glob.glob(
        str(tmp_path / "plain" / "*instruct*.json"))[0]))
    pld = json.load(open(glob.glob(
        str(tmp_path / "pld" / "*instruct*.json"))[0]))
    assert plain.keys() == pld.keys() and len(plain) == 4
    for k in plain:
        assert plain[k]["pred"] == pld[k]["pred"]


@pytest.mark.slow
def test_train_rgcn_instruct_cli(instruct_root, csv_path, tmp_path):
    from prot2text_tpu.cli.train_rgcn_instruct import main

    main(["--data_root", instruct_root, "--train_csv", csv_path,
          "--debug_tiny_model", "true", "--num_epochs", "1",
          "--batch_size", "2", "--model_dtype", "fp32",
          "--attn_impl", "xla", "--lora_rank", "2", "--rgcn_layers", "2",
          "--edge_budget", "512",
          "--checkpoint_dir", str(tmp_path / "gck")])
    assert glob.glob(str(tmp_path / "gck" / "checkpoints_*" / "step_*"))


@pytest.mark.parametrize("mod", [
    "train_contrast", "train_instruct", "train_legacy",
    "train_rgcn_instruct", "generate_instruct", "generate_instruct_light",
    "generate_legacy", "benchmark", "convert_checkpoint", "get_data",
    "serve", "train_draft",
])
def test_cli_help(mod):
    import importlib

    m = importlib.import_module(f"prot2text_tpu.cli.{mod}")
    with pytest.raises(SystemExit) as e:
        if hasattr(m, "build_parser"):
            m.build_parser().parse_args(["--help"])
        else:
            m.main(["--help"])
    assert e.value.code == 0


@pytest.mark.slow
def test_train_contrast_resume(csv_path, tmp_path):
    from prot2text_tpu.cli.train_contrast import main

    base = ["--train_csv", csv_path, "--debug_tiny_model", "true",
            "--batch_size", "2", "--gradient_accumulation_steps", "1",
            "--model_dtype", "fp32", "--attn_impl", "xla"]
    main(base + ["--num_epochs", "1", "--checkpoint_dir", str(tmp_path)])
    ck = sorted(glob.glob(str(tmp_path / "checkpoints_*")))[-1]
    # resume picks up params + optimizer + STEP COUNTER
    main(base + ["--num_epochs", "1",
                 "--resume_checkpoint_dir", ck,
                 "--checkpoint_dir", str(tmp_path / "resumed")])
    ck2 = sorted(glob.glob(str(tmp_path / "resumed" / "checkpoints_*")))[-1]
    from prot2text_tpu.core.checkpoint import restore_checkpoint

    assert int(restore_checkpoint(ck2)["step"]) > int(
        restore_checkpoint(ck)["step"])


def test_generate_light_speculative_cli(csv_path, tmp_path):
    """--speculative_gamma on the light CLI (tiny random draft) must decode
    every protein (outputs are exact-greedy by construction, verified at the
    kernel level in tests/test_speculative.py)."""
    from prot2text_tpu.cli.generate_instruct_light import main as gen_main

    gen_main(["--test_csv", csv_path, "--debug_tiny_model", "true",
              "--model_dtype", "fp32", "--attn_impl", "xla",
              "--batch_size", "2", "--max_new_tokens", "4",
              "--speculative_gamma", "2",
              "--output_dir", str(tmp_path / "spec_res")])
    out = glob.glob(str(tmp_path / "spec_res" / "*.json"))
    assert out
    data = json.load(open(out[0]))
    assert len(data) == 4
    assert all("pred" in v for v in data.values())


def test_generate_light_self_speculative_cli(csv_path, tmp_path):
    """--self_speculative_layers: early-exit self-draft, no draft model."""
    from prot2text_tpu.cli.generate_instruct_light import main as gen_main

    gen_main(["--test_csv", csv_path, "--debug_tiny_model", "true",
              "--model_dtype", "fp32", "--attn_impl", "xla",
              "--batch_size", "2", "--max_new_tokens", "4",
              "--speculative_gamma", "2", "--self_speculative_layers", "1",
              "--output_dir", str(tmp_path / "selfspec_res")])
    out = glob.glob(str(tmp_path / "selfspec_res" / "*.json"))
    assert out
    data = json.load(open(out[0]))
    assert len(data) == 4
    assert all("pred" in v for v in data.values())


def test_generate_light_prompt_lookup_cli(csv_path, tmp_path):
    """--prompt_lookup_tokens: n-gram lookup drafting, no draft model."""
    from prot2text_tpu.cli.generate_instruct_light import main as gen_main

    gen_main(["--test_csv", csv_path, "--debug_tiny_model", "true",
              "--model_dtype", "fp32", "--attn_impl", "xla",
              "--batch_size", "2", "--max_new_tokens", "4",
              "--prompt_lookup_tokens", "3",
              "--output_dir", str(tmp_path / "pld_res")])
    out = glob.glob(str(tmp_path / "pld_res" / "*.json"))
    assert out
    data = json.load(open(out[0]))
    assert len(data) == 4
    assert all("pred" in v for v in data.values())


@pytest.mark.slow
def test_serve_cli_continuous(csv_path, tmp_path):
    """The continuous-batching serving CLI produces the reference output
    format; predictions must match the lockstep generator CLI's for the
    same (greedy, tiny random) model seed."""
    from prot2text_tpu.cli.serve import main as serve_main

    out = serve_main([
        "--test_csv", csv_path, "--debug_tiny_model", "true",
        "--model_dtype", "fp32", "--attn_impl", "xla",
        "--max_slots", "2", "--sync_every", "2", "--prompt_pad", "512",
        "--max_new_tokens", "4",
        "--output_dir", str(tmp_path / "serve_out")])
    files = glob.glob(str(tmp_path / "serve_out" / "*.json"))
    assert files
    data = json.load(open(files[0]))
    assert len(data) == 4
    assert all("true" in v and "pred" in v for v in data.values())
    assert out.keys() == data.keys()

    # lockstep reference CLI with the same seed/model
    from prot2text_tpu.cli.generate_instruct_light import main as gen_main

    gen_main(["--test_csv", csv_path, "--debug_tiny_model", "true",
              "--model_dtype", "fp32", "--attn_impl", "xla",
              "--batch_size", "2", "--max_new_tokens", "4",
              "--output_dir", str(tmp_path / "gen_out")])
    ref = json.load(open(glob.glob(str(tmp_path / "gen_out" / "*.json"))[0]))
    assert set(ref) == set(data)
    for name in ref:
        assert data[name]["pred"] == ref[name]["pred"], name


@pytest.mark.slow
def test_train_draft_and_serve_medusa_cli(csv_path, tmp_path):
    """train_draft trains Medusa heads on the CSV descriptions and saves
    an npz; serve --medusa_path decodes with the learned-draft engine and
    produces predictions identical to plain greedy serving."""
    from prot2text_tpu.cli.train_draft import main as draft_main
    from prot2text_tpu.cli.serve import main as serve_main

    npz = str(tmp_path / "medusa.npz")
    draft_main([
        "--train_csv", csv_path, "--debug_tiny_model", "true",
        "--model_dtype", "fp32", "--attn_impl", "xla",
        "--num_heads", "2", "--batch_size", "2", "--num_epochs", "2",
        "--max_sequence_length", "48", "--output_path", npz])
    z = np.load(npz)
    assert z["w"].shape[0] == 2 and z["b"].shape[0] == 2

    plain = serve_main([
        "--test_csv", csv_path, "--debug_tiny_model", "true",
        "--model_dtype", "fp32", "--attn_impl", "xla",
        "--max_slots", "2", "--sync_every", "2", "--prompt_pad", "512",
        "--max_new_tokens", "4",
        "--output_dir", str(tmp_path / "serve_plain")])
    spec = serve_main([
        "--test_csv", csv_path, "--debug_tiny_model", "true",
        "--model_dtype", "fp32", "--attn_impl", "xla",
        "--max_slots", "2", "--sync_every", "2", "--prompt_pad", "512",
        "--max_new_tokens", "4", "--medusa_path", npz,
        "--output_dir", str(tmp_path / "serve_medusa")])
    assert set(plain) == set(spec)
    for name in plain:
        assert spec[name]["pred"] == plain[name]["pred"], name
