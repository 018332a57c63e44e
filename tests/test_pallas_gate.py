"""Multi-device dispatch safety: plain pallas_calls don't partition under
GSPMD, so every kernel dispatch must yield to its XLA fallback whenever an
ambient mesh with >1 device is active (kernels/attention.py
pallas_single_device_ok).  CPU never reaches pallas, so these tests pin the
GATE itself plus the decode paths running end-to-end under a sharded mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prot2text_tpu.kernels.attention import pallas_single_device_ok
from prot2text_tpu.infer.generate import GenerationConfig, generate
from prot2text_tpu.models.decoder import DecoderConfig, init_decoder_params

CFG = DecoderConfig(
    vocab_size=128, hidden_size=256, num_layers=2, num_heads=4,
    num_kv_heads=2, intermediate_size=512, head_dim=128, rope_theta=1e4)


def test_gate_reflects_ambient_mesh():
    assert pallas_single_device_ok()          # no mesh
    devs = np.array(jax.devices()[:1])
    with jax.set_mesh(Mesh(devs, ("dp",))):
        assert pallas_single_device_ok()      # degenerate 1-device mesh
    devs8 = np.array(jax.devices()).reshape(4, 2)
    with jax.set_mesh(Mesh(devs8, ("dp", "tp"))):
        assert not pallas_single_device_ok()  # real multi-device mesh

    # the gate is honored at TRACE time inside jit
    seen = {}

    def f(x):
        seen["ok"] = pallas_single_device_ok()
        return x

    with jax.set_mesh(Mesh(devs8, ("dp", "tp"))):
        jax.jit(f)(jnp.ones(4))
    assert seen["ok"] is False


def test_generate_kv8_under_sharded_mesh():
    """Quantized-KV generate (XLA fallback path) runs under a dp-sharded
    batch on an 8-device mesh and matches the unsharded tokens."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(0), jnp.bfloat16)
    B, Pp = 4, 6
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, Pp, CFG.hidden_size),
                            jnp.bfloat16)
    mask = jnp.ones((B, Pp), jnp.int32)
    gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1, pad_token_id=0)
    want = np.asarray(generate(CFG, params, inputs_embeds=emb,
                               attention_mask=mask, gen_cfg=gen, kv_bits=8))

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "tp"))
    with jax.set_mesh(mesh):
        emb_s = jax.device_put(emb, NamedSharding(mesh, P("dp")))
        mask_s = jax.device_put(mask, NamedSharding(mesh, P("dp")))
        got = np.asarray(generate(CFG, params, inputs_embeds=emb_s,
                                  attention_mask=mask_s, gen_cfg=gen,
                                  kv_bits=8))
    np.testing.assert_array_equal(got, want)
