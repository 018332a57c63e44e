"""Composed protein→text models, signature-compatible with the reference.

Public classes keep the reference's names and forward/generate keyword surface
(BASELINE.json requirement):
  * Esm2LlamaInstructForCausalLM  — modeling_esm2llama_instruct.py:71-268
  * Esm2LlamaForCausalLM (legacy) — modeling_esm2llama_legacy.py:127-574
  * Esm2Rgcn2LlamaInstructForCausalLM — modeling_esm2rgcn2llama_instruct.py:232-445
  * ESMCQwen — esmc_qwen_arc.py:31-273

Each class is a thin stateful shell (configs + param pytrees) over jitted
pure functions; training code bypasses the shells and jits the functional
cores directly (train/).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenization import ProteinTokenizer, esmc_tokenizer
from .adapters import (
    ModalityAdapterConfig, RgcnAdapterConfig, init_modality_adapter_params,
    init_rgcn_adapter_params, modality_adapter, rgcn_adapter,
)
from .decoder import (
    causal_bias_from_mask, contiguous_lengths, cross_entropy_loss,
    decoder_forward, decoder_logits, embed_tokens,
)
from .esm2 import ESM2Config, esm2_encode, init_esm2_params
from .esmc import ESMCConfig as ESMCEncoderConfig, esmc_encode, init_esmc_params
from .fusion import concat_fusion, count_check, placeholder_merge
from .llama import LlamaConfig, init_llama_params
from .qwen3 import Qwen3Config, init_qwen3_params
from .transformer import layer_norm, linear


@dataclasses.dataclass
class ModelOutput:
    loss: Optional[jax.Array] = None
    logits: Optional[jax.Array] = None
    hidden_states: Optional[jax.Array] = None


# ---------------------------------------------------------------------------
# Esm2LlamaInstructForCausalLM


@dataclasses.dataclass(frozen=True)
class Esm2LlamaInstructConfig:
    """Composite config (reference configuration_esm2llama_instruct.py:12-33)."""

    esm_config: ESM2Config
    adapter_config: ModalityAdapterConfig
    llama_config: LlamaConfig
    placeholder_id: int = 128003


class Esm2LlamaInstructForCausalLM:
    """ESM2 + ModalityAdapter + Llama with placeholder-token fusion."""

    def __init__(self, config: Esm2LlamaInstructConfig, params=None, *,
                 rng=None, attn_impl: str = "xla"):
        self.config = config
        self.attn_impl = attn_impl
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            ke, ka, kd = jax.random.split(rng, 3)
            params = {
                "esm_encoder": init_esm2_params(config.esm_config, ke),
                "adapter": init_modality_adapter_params(
                    config.adapter_config, ka),
                "llama_decoder": init_llama_params(config.llama_config, kd),
            }
        self.params = params

    # functional core -------------------------------------------------------
    @staticmethod
    def apply(
        config: Esm2LlamaInstructConfig,
        params,
        *,
        input_ids=None,
        attention_mask=None,
        labels=None,
        protein_input_ids=None,
        protein_attention_mask=None,
        protein_inputs_embeds=None,
        return_encoder_outputs: bool = False,
        return_adapter_outputs: bool = False,
        return_decoder_inputs: bool = False,
        deterministic: bool = True,
        dropout_rng=None,
        attn_impl: str = "xla",
        remat: bool = False,
    ):
        enc = esm2_encode(
            config.esm_config, params["esm_encoder"], protein_input_ids,
            protein_attention_mask, inputs_embeds=protein_inputs_embeds,
            attn_impl=attn_impl, remat=remat)
        if return_encoder_outputs:
            return enc
        adapted = modality_adapter(
            config.adapter_config, params["adapter"], enc,
            deterministic=deterministic, dropout_key=dropout_rng)
        if return_adapter_outputs:
            return adapted, protein_attention_mask
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        text_embeds = embed_tokens(params["llama_decoder"], input_ids)
        inputs_embeds = placeholder_merge(
            text_embeds, input_ids, adapted, protein_attention_mask,
            config.placeholder_id)
        if return_decoder_inputs:
            return inputs_embeds, attention_mask
        core = config.llama_config.core()
        bias = causal_bias_from_mask(attention_mask)
        B, S = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        h, _ = decoder_forward(
            core, params["llama_decoder"], inputs_embeds=inputs_embeds,
            bias=bias, positions=positions, attn_impl=attn_impl, remat=remat,
            attn_lengths=contiguous_lengths(attention_mask))
        logits = decoder_logits(core, params["llama_decoder"], h)
        loss = None
        if labels is not None:
            loss = cross_entropy_loss(logits, labels)
        return ModelOutput(loss=loss, logits=logits, hidden_states=h)

    def forward(self, **kw):
        return self.apply(self.config, self.params,
                          attn_impl=self.attn_impl, **kw)

    __call__ = forward

    def generate(self, inputs, attention_mask=None, protein_input_ids=None,
                 protein_attention_mask=None, protein_inputs_embeds=None,
                 **gen_kwargs):
        """Prompt-only inputs; output contains ONLY new tokens (reference
        modeling_esm2llama_instruct.py:229)."""
        text_ids, text_mask = inputs, attention_mask
        inputs_embeds, attention_mask = self.apply(
            self.config, self.params,
            input_ids=inputs, attention_mask=attention_mask,
            protein_input_ids=protein_input_ids,
            protein_attention_mask=protein_attention_mask,
            protein_inputs_embeds=protein_inputs_embeds,
            return_decoder_inputs=True, attn_impl=self.attn_impl)
        from ..infer.generate import resolve_generation_config, run_generation

        kv_bits = gen_kwargs.pop("kv_bits", None)  # int8 KV cache opt-in

        lc = self.config.llama_config
        gen_cfg = resolve_generation_config(
            lc.eos_token_id, lc.pad_token_id, gen_kwargs)
        return run_generation(
            lc.core(), self.params["llama_decoder"],
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            gen_cfg=gen_cfg, attn_impl=self.attn_impl, kv_bits=kv_bits,
            prompt_ids=text_ids, prompt_ids_mask=text_mask)


# ---------------------------------------------------------------------------
# Legacy Esm2LlamaForCausalLM (concat fusion)


@dataclasses.dataclass(frozen=True)
class Esm2LlamaConfig:
    """Reference configuration_esm2llama_legacy.py:29-162 (composite)."""

    esm_config: ESM2Config
    llama_config: LlamaConfig
    decoder_hidden_size: Optional[int] = None  # enables linear adapter + LN
    bos_token_id: int = 128000
    eos_token_id: int = 128001  # base (non-instruct) eos


class Esm2LlamaForCausalLM:
    """ESM2 encoder (+Linear+LayerNorm adapter) concatenated in front of the
    text embeds (reference modeling_esm2llama_legacy.py:294-360)."""

    @classmethod
    def from_pretrained(cls, config: "Esm2LlamaConfig", *,
                        combined_checkpoint_dir=None,
                        esm_checkpoint_dir=None,
                        llama_checkpoint_dir=None,
                        dtype=None, rng=None, attn_impl: str = "xla"):
        """4-way loading mirroring the reference's from_pretrained modes
        (configuration_esm2llama_legacy.py:29-162): a combined orbax
        checkpoint, separate HF esm+llama dirs, or either one alone (the
        missing component stays randomly initialized)."""
        import jax.numpy as jnp

        from ..core.checkpoint import restore_checkpoint
        from .hf_import import (
            decoder_params_from_hf, esm2_params_from_hf, load_state_dict_dir,
        )

        dtype = dtype or jnp.float32
        model = cls(config, rng=rng, attn_impl=attn_impl)
        if combined_checkpoint_dir:
            restored = restore_checkpoint(combined_checkpoint_dir)
            model.params = restored.get("model", restored)
            return model
        if esm_checkpoint_dir:
            model.params["esm_encoder"] = esm2_params_from_hf(
                load_state_dict_dir(esm_checkpoint_dir),
                config.esm_config.num_layers, dtype)
        if llama_checkpoint_dir:
            model.params["llama_decoder"] = decoder_params_from_hf(
                load_state_dict_dir(llama_checkpoint_dir),
                config.llama_config.num_layers, dtype,
                tie_word_embeddings=config.llama_config.tie_word_embeddings)
        return model

    def predict_contacts(self, *a, **kw):
        """The legacy encoder wrapper strips the contact head — calling this
        raises, as in the reference (modeling_esm2llama_legacy.py:115-124)."""
        raise NotImplementedError(
            "contact prediction head is removed from the encoder")

    def __init__(self, config: Esm2LlamaConfig, params=None, *, rng=None,
                 attn_impl: str = "xla"):
        self.config = config
        self.attn_impl = attn_impl
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            ke, ka, kd = jax.random.split(rng, 3)
            params = {
                "esm_encoder": init_esm2_params(config.esm_config, ke),
                "llama_decoder": init_llama_params(config.llama_config, kd),
            }
            if config.decoder_hidden_size is not None:
                h_in = config.esm_config.hidden_size
                h_out = config.decoder_hidden_size
                params["encoder_adapter"] = {
                    "dense": {
                        "kernel": jax.random.normal(ka, (h_in, h_out)) * 0.02,
                        "bias": jnp.zeros((h_out,)),
                    },
                    "ln": {"scale": jnp.ones((h_out,)),
                           "bias": jnp.zeros((h_out,))},
                }
        self.params = params

    @staticmethod
    def apply(
        config: Esm2LlamaConfig,
        params,
        *,
        input_ids=None,
        attention_mask=None,
        labels=None,
        protein_input_ids=None,
        protein_attention_mask=None,
        return_encoder_output: bool = False,
        encoder_output=None,       # pre-computed (embeds, mask) pair
        attn_impl: str = "xla",
        remat: bool = False,
    ):
        if encoder_output is None:
            enc = esm2_encode(
                config.esm_config, params["esm_encoder"], protein_input_ids,
                protein_attention_mask, attn_impl=attn_impl, remat=remat)
            if "encoder_adapter" in params:
                enc = linear(params["encoder_adapter"]["dense"], enc)
                enc = layer_norm(params["encoder_adapter"]["ln"], enc)
            enc_mask = protein_attention_mask
        else:
            enc, enc_mask = encoder_output
        if return_encoder_output:
            return enc, enc_mask

        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        text_embeds = embed_tokens(params["llama_decoder"], input_ids)
        inputs_embeds, full_mask, full_labels = concat_fusion(
            enc, enc_mask, text_embeds, attention_mask, labels)
        core = config.llama_config.core()
        bias = causal_bias_from_mask(full_mask)
        B, S, _ = inputs_embeds.shape
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        h, _ = decoder_forward(
            core, params["llama_decoder"], inputs_embeds=inputs_embeds,
            bias=bias, positions=positions, attn_impl=attn_impl, remat=remat,
            attn_lengths=contiguous_lengths(attention_mask))
        logits = decoder_logits(core, params["llama_decoder"], h)
        loss = None
        if full_labels is not None:
            loss = cross_entropy_loss(logits, full_labels)
        return ModelOutput(loss=loss, logits=logits, hidden_states=h)

    def forward(self, **kw):
        return self.apply(self.config, self.params,
                          attn_impl=self.attn_impl, **kw)

    __call__ = forward

    def generate(self, inputs=None, attention_mask=None,
                 protein_input_ids=None, protein_attention_mask=None,
                 **gen_kwargs):
        """Output INCLUDES the prompt ids (reference
        modeling_esm2llama_legacy.py:505-507, :574). Default prompt is a
        single bos per row (:553-560)."""
        enc, enc_mask = self.apply(
            self.config, self.params,
            protein_input_ids=protein_input_ids,
            protein_attention_mask=protein_attention_mask,
            return_encoder_output=True, attn_impl=self.attn_impl)
        B = enc.shape[0]
        if inputs is None:
            inputs = jnp.full((B, 1), self.config.bos_token_id, jnp.int32)
            attention_mask = jnp.ones((B, 1), jnp.int32)
        if attention_mask is None:
            attention_mask = jnp.ones_like(inputs)
        text_embeds = embed_tokens(self.params["llama_decoder"], inputs)
        inputs_embeds, full_mask, _ = concat_fusion(
            enc, enc_mask, text_embeds, attention_mask)
        lc = self.config.llama_config
        from ..infer.generate import resolve_generation_config, run_generation

        kv_bits = gen_kwargs.pop("kv_bits", None)  # int8 KV cache opt-in

        gen_cfg = resolve_generation_config(
            self.config.eos_token_id, lc.pad_token_id, gen_kwargs)
        new_tokens = run_generation(
            lc.core(), self.params["llama_decoder"],
            inputs_embeds=inputs_embeds, attention_mask=full_mask,
            gen_cfg=gen_cfg, attn_impl=self.attn_impl, kv_bits=kv_bits,
            prompt_ids=inputs, prompt_ids_mask=attention_mask)
        return jnp.concatenate([inputs, new_tokens], axis=1)


# ---------------------------------------------------------------------------
# Esm2Rgcn2LlamaInstructForCausalLM


@dataclasses.dataclass(frozen=True)
class Esm2Rgcn2LlamaInstructConfig:
    """Reference configuration_esm2rgcn2llama_instruct.py:34-55."""

    esm_config: ESM2Config
    adapter_config: RgcnAdapterConfig
    llama_config: LlamaConfig
    placeholder_id: int = 128003


class Esm2Rgcn2LlamaInstructForCausalLM:
    """Instruct skeleton with an RGCN structure-graph adapter; graph tensors
    ride alongside the protein tokens (reference
    modeling_esm2rgcn2llama_instruct.py:317-362)."""

    def __init__(self, config: Esm2Rgcn2LlamaInstructConfig, params=None, *,
                 rng=None, attn_impl: str = "xla"):
        self.config = config
        self.attn_impl = attn_impl
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            ke, ka, kd = jax.random.split(rng, 3)
            params = {
                "esm_encoder": init_esm2_params(config.esm_config, ke),
                "adapter": init_rgcn_adapter_params(config.adapter_config, ka),
                "llama_decoder": init_llama_params(config.llama_config, kd),
            }
        self.params = params

    @staticmethod
    def apply(
        config: Esm2Rgcn2LlamaInstructConfig,
        params,
        *,
        input_ids=None,
        attention_mask=None,
        labels=None,
        protein_input_ids=None,
        protein_attention_mask=None,
        graph_edge_index=None,     # (2, E_max) flat-node space
        graph_edge_type=None,      # (E_max,)
        graph_edge_mask=None,      # (E_max,)
        return_encoder_outputs: bool = False,
        return_adapter_outputs: bool = False,
        return_decoder_inputs: bool = False,
        deterministic: bool = True,
        dropout_rng=None,
        attn_impl: str = "xla",
        remat: bool = False,
    ):
        enc = esm2_encode(
            config.esm_config, params["esm_encoder"], protein_input_ids,
            protein_attention_mask, attn_impl=attn_impl, remat=remat)
        if return_encoder_outputs:
            return enc
        adapted = rgcn_adapter(
            config.adapter_config, params["adapter"], enc,
            protein_attention_mask, graph_edge_index, graph_edge_type,
            graph_edge_mask, deterministic=deterministic,
            dropout_key=dropout_rng)
        if return_adapter_outputs:
            return adapted, protein_attention_mask
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        text_embeds = embed_tokens(params["llama_decoder"], input_ids)
        inputs_embeds = placeholder_merge(
            text_embeds, input_ids, adapted, protein_attention_mask,
            config.placeholder_id)
        if return_decoder_inputs:
            return inputs_embeds, attention_mask
        core = config.llama_config.core()
        bias = causal_bias_from_mask(attention_mask)
        B, S = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        h, _ = decoder_forward(
            core, params["llama_decoder"], inputs_embeds=inputs_embeds,
            bias=bias, positions=positions, attn_impl=attn_impl, remat=remat,
            attn_lengths=contiguous_lengths(attention_mask))
        logits = decoder_logits(core, params["llama_decoder"], h)
        loss = None
        if labels is not None:
            loss = cross_entropy_loss(logits, labels)
        return ModelOutput(loss=loss, logits=logits, hidden_states=h)

    def forward(self, **kw):
        return self.apply(self.config, self.params,
                          attn_impl=self.attn_impl, **kw)

    __call__ = forward

    def generate(self, inputs, attention_mask=None, protein_input_ids=None,
                 protein_attention_mask=None, graph_edge_index=None,
                 graph_edge_type=None, graph_edge_mask=None, **gen_kwargs):
        text_ids, text_mask = inputs, attention_mask
        inputs_embeds, attention_mask = self.apply(
            self.config, self.params,
            input_ids=inputs, attention_mask=attention_mask,
            protein_input_ids=protein_input_ids,
            protein_attention_mask=protein_attention_mask,
            graph_edge_index=graph_edge_index,
            graph_edge_type=graph_edge_type,
            graph_edge_mask=graph_edge_mask,
            return_decoder_inputs=True, attn_impl=self.attn_impl)
        from ..infer.generate import resolve_generation_config, run_generation

        kv_bits = gen_kwargs.pop("kv_bits", None)  # int8 KV cache opt-in

        lc = self.config.llama_config
        gen_cfg = resolve_generation_config(
            lc.eos_token_id, lc.pad_token_id, gen_kwargs)
        return run_generation(
            lc.core(), self.params["llama_decoder"],
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            gen_cfg=gen_cfg, attn_impl=self.attn_impl, kv_bits=kv_bits,
            prompt_ids=text_ids, prompt_ids_mask=text_mask)


# ---------------------------------------------------------------------------
# ESMCQwen


@dataclasses.dataclass(frozen=True)
class ESMCQwenConfig:
    """Reference models/esmc_config.py:5-22."""

    esm_config: ESMCEncoderConfig
    adapter_config: ModalityAdapterConfig
    llm_config: Qwen3Config
    placeholder_id: int = 151669  # added special token in the Qwen vocab
    llm_model_name: str = "Qwen/Qwen3-14B"
    esm_model_name: str = "esmc_600m"


class ESMCQwen:
    """ESMC + ModalityAdapter + Qwen3 — raw protein strings in, text out
    (reference esmc_qwen_arc.py:31-273)."""

    def __init__(self, config: ESMCQwenConfig, params=None, *, rng=None,
                 attn_impl: str = "xla",
                 tokenizer: Optional[ProteinTokenizer] = None):
        self.config = config
        self.attn_impl = attn_impl
        self.protein_tokenizer = tokenizer or esmc_tokenizer()
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            ke, ka, kd = jax.random.split(rng, 3)
            params = {
                "esm_encoder": init_esmc_params(config.esm_config, ke),
                "adapter": init_modality_adapter_params(
                    config.adapter_config, ka),
                "llm_decoder": init_qwen3_params(config.llm_config, kd),
            }
        self.params = params

    def encode_protein_sequences(self, protein_sequences: List[str],
                                 pad_to: Optional[int] = None):
        """Tokenize (host) + ESMC encode (device) → (embeddings, mask).
        Unlike the reference (which tokenizes inside forward on the hot path,
        esmc_qwen_arc.py:70-78 — see SURVEY.md §3.2), tokenization here is a
        separable host step so training can pre-tokenize in the input
        pipeline."""
        ids, mask = self.protein_tokenizer.batch_encode(
            protein_sequences, pad_to=pad_to)
        emb = esmc_encode(self.config.esm_config, self.params["esm_encoder"],
                          jnp.asarray(ids), jnp.asarray(mask),
                          attn_impl=self.attn_impl)
        return emb, jnp.asarray(mask)

    @staticmethod
    def apply(
        config: ESMCQwenConfig,
        params,
        *,
        protein_input_ids,          # pre-tokenized (B, P)
        protein_attention_mask,     # (B, P)
        input_ids=None,
        attention_mask=None,
        labels=None,
        return_encoder_outputs: bool = False,
        return_decoder_inputs: bool = False,
        deterministic: bool = True,
        dropout_rng=None,
        attn_impl: str = "xla",
        remat: bool = False,
    ):
        enc = esmc_encode(
            config.esm_config, params["esm_encoder"], protein_input_ids,
            protein_attention_mask, attn_impl=attn_impl, remat=remat)
        adapted = modality_adapter(
            config.adapter_config, params["adapter"], enc,
            deterministic=deterministic, dropout_key=dropout_rng)
        if return_encoder_outputs:
            return (adapted,)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        text_embeds = embed_tokens(params["llm_decoder"], input_ids)
        inputs_embeds = placeholder_merge(
            text_embeds, input_ids, adapted, protein_attention_mask,
            config.placeholder_id)
        if return_decoder_inputs:
            return inputs_embeds, attention_mask
        core = config.llm_config.core()
        bias = causal_bias_from_mask(attention_mask)
        B, S = input_ids.shape
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        h, _ = decoder_forward(
            core, params["llm_decoder"], inputs_embeds=inputs_embeds,
            bias=bias, positions=positions, attn_impl=attn_impl, remat=remat,
            attn_lengths=contiguous_lengths(attention_mask))
        logits = decoder_logits(core, params["llm_decoder"], h)
        loss = None
        if labels is not None:
            loss = cross_entropy_loss(logits, labels)
        return ModelOutput(loss=loss, logits=logits, hidden_states=h)

    def forward(self, protein_sequences: Optional[List[str]] = None,
                protein_input_ids=None, protein_attention_mask=None, **kw):
        if protein_sequences is not None:
            ids, mask = self.protein_tokenizer.batch_encode(protein_sequences)
            protein_input_ids = jnp.asarray(ids)
            protein_attention_mask = jnp.asarray(mask)
        if (kw.get("input_ids") is not None
                and not kw.get("return_encoder_outputs", False)):
            ok = count_check(kw["input_ids"], self.config.placeholder_id,
                             protein_attention_mask)
            if not bool(np.asarray(ok).all()):
                raise ValueError(
                    "Number of placeholder tokens must match number of "
                    "protein tokens")  # esmc_qwen_arc.py:137-141
        return self.apply(
            self.config, self.params,
            protein_input_ids=protein_input_ids,
            protein_attention_mask=protein_attention_mask,
            attn_impl=self.attn_impl, **kw)

    __call__ = forward

    def generate(self, input_ids, attention_mask=None,
                 protein_sequences: Optional[List[str]] = None,
                 protein_input_ids=None, protein_attention_mask=None,
                 **gen_kwargs):
        if protein_sequences is None and protein_input_ids is None:
            raise ValueError("protein_sequences must be provided for generation")
        text_ids, text_mask = input_ids, attention_mask
        inputs_embeds, attention_mask = self.forward(
            protein_sequences=protein_sequences,
            protein_input_ids=protein_input_ids,
            protein_attention_mask=protein_attention_mask,
            input_ids=input_ids, attention_mask=attention_mask,
            return_decoder_inputs=True)
        from ..infer.generate import resolve_generation_config, run_generation

        kv_bits = gen_kwargs.pop("kv_bits", None)  # int8 KV cache opt-in

        qc = self.config.llm_config
        gen_cfg = resolve_generation_config(
            qc.eos_token_id, qc.pad_token_id, gen_kwargs)
        return run_generation(
            qc.core(), self.params["llm_decoder"],
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            gen_cfg=gen_cfg, attn_impl=self.attn_impl, kv_bits=kv_bits,
            prompt_ids=text_ids, prompt_ids_mask=text_mask)
