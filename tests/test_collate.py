"""Collator layout tests against the reference docstring diagrams
(dataloader.py:23-45, dataloader_derived.py:33-58, dataloader_light.py)."""

import numpy as np

from prot2text_tpu.data.chat import ByteTextTokenizer
from prot2text_tpu.data.collate import (
    Buckets, DerivedCollator, InstructCollator, LightCollator, pad_stack,
)
from prot2text_tpu.data.tokenization import ProteinTokenizer


def test_pad_stack_sides_and_bucket():
    a = np.array([1, 2, 3])
    b = np.array([4])
    out = pad_stack([a, b], 0, "left")
    np.testing.assert_array_equal(out, [[1, 2, 3], [0, 0, 4]])
    out = pad_stack([a, b], 9, "right", width=5)
    np.testing.assert_array_equal(out, [[1, 2, 3, 9, 9], [4, 9, 9, 9, 9]])


def _records():
    return [
        {"name": "P1",
         "sequence_input_ids": np.array([0, 5, 6, 7, 2]),
         "prompt_input_ids": np.array([300, 301, 302, 303]),
         "description_input_ids": np.array([10, 11, 12, 128009])},
        {"name": "P2",
         "sequence_input_ids": np.array([0, 8, 2]),
         "prompt_input_ids": np.array([300, 304]),
         "description_input_ids": np.array([13, 128009])},
    ]


def test_instruct_collator_train_layout():
    c = InstructCollator(text_pad_token_id=128002, mode="train")
    out = c(_records())
    # sequences right-padded with ESM pad 1
    np.testing.assert_array_equal(
        out["protein_input_ids"], [[0, 5, 6, 7, 2], [0, 8, 2, 1, 1]])
    np.testing.assert_array_equal(
        out["protein_attention_mask"], [[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]])
    # prompt left-padded ‖ description right-padded
    np.testing.assert_array_equal(
        out["input_ids"],
        [[300, 301, 302, 303, 10, 11, 12, 128009],
         [128002, 128002, 300, 304, 13, 128009, 128002, 128002]])
    np.testing.assert_array_equal(
        out["attention_mask"],
        [[1, 1, 1, 1, 1, 1, 1, 1], [0, 0, 1, 1, 1, 1, 0, 0]])
    # labels: -100 over prompt and padding
    np.testing.assert_array_equal(
        out["labels"],
        [[-100, -100, -100, -100, 10, 11, 12, 128009],
         [-100, -100, -100, -100, 13, 128009, -100, -100]])


def test_instruct_collator_inference_layout():
    c = InstructCollator(text_pad_token_id=128002, mode="inference")
    out = c(_records())
    np.testing.assert_array_equal(
        out["input_ids"], [[300, 301, 302, 303], [128002, 128002, 300, 304]])
    assert "labels" not in out
    assert out["description_input_ids"].shape == (2, 4)


def test_instruct_collator_buckets():
    c = InstructCollator(
        text_pad_token_id=0, mode="train",
        buckets=Buckets(protein=[8, 16], prompt=[8], description=[8]))
    out = c(_records())
    assert out["protein_input_ids"].shape == (2, 8)
    assert out["input_ids"].shape == (2, 16)


def test_derived_collator_layout():
    tok = ByteTextTokenizer()
    c = DerivedCollator(tokenizer=tok, original_eos_token_id=128009,
                        mode="train")
    out = c(_records())
    # prompt = bos + sentence + bos, same for every row
    p = out["input_ids"][:, :len(c.prompt_input_ids)]
    assert (p[0] == p[1]).all()
    assert p[0][0] == tok.bos_token_id and p[0][-1] == tok.bos_token_id
    # instruct eos rewritten to byte-tokenizer eos
    assert (out["description_input_ids"] != 128009).all()
    assert (out["description_input_ids"] == tok.eos_token_id).any()
    # sequences LEFT-padded (dataloader_derived.py:139-148)
    np.testing.assert_array_equal(
        out["protein_input_ids"][1][:2], [1, 1])
    assert "descriptions" in out


def test_light_collator_roundtrip():
    tok = ByteTextTokenizer()
    c = LightCollator(tokenizer=tok, mode="train", chat_family="llama3",
                      placeholder_token=tok.placeholder_token,
                      name_dropout=0.0, taxonomy_dropout=0.0)
    rows = [
        {"AlphaFoldDB": "A1", "Full Name": "Kinase", "taxon": "Human",
         "sequence": "MKTAYI", "function": "Phosphorylates things."},
        {"AlphaFoldDB": "A2", "Full Name": float("nan"), "taxon": "Yeast",
         "sequence": "MKV", "function": "Binds stuff."},
    ]
    out = c(rows)
    # placeholder count per row == protein token count (len+2)
    ph = (out["input_ids"] == tok.placeholder_id).sum(axis=1)
    np.testing.assert_array_equal(ph, [8, 5])
    np.testing.assert_array_equal(
        out["protein_attention_mask"].sum(axis=1), [8, 5])
    # nan name → "unknown"
    prompt_text = tok.decode(out["input_ids"][1], skip_special_tokens=True)
    assert "unknown" in prompt_text
    assert "Kinase" in tok.decode(out["input_ids"][0],
                                  skip_special_tokens=True)
    # labels mask prompt region entirely
    P = out["input_ids"].shape[1] - out["description_input_ids"].shape[1]
    assert (out["labels"][:, :P] == -100).all()
    # description ends with eos then pads
    d0 = out["description_input_ids"][0]
    L0 = out["description_attention_mask"][0].sum()
    assert d0[L0 - 1] == tok.eos_token_id


def test_light_collator_random_crop():
    tok = ByteTextTokenizer()
    c = LightCollator(tokenizer=tok, mode="train",
                      placeholder_token=tok.placeholder_token,
                      max_sequence_length=10)
    rows = [{"AlphaFoldDB": "A", "Full Name": "X", "taxon": "Y",
             "sequence": "A" * 50, "function": "f"}]
    out = c(rows)
    assert len(out["protein_sequences"][0]) == 10
    assert out["protein_attention_mask"].sum() == 12  # 10 + cls/eos
