"""Golden greedy transcripts: exact token sequences for fixed seeds.

Guards the parity-critical decode path against silent numeric drift across
refactors (the BASELINE requirement is token-identical greedy transcripts;
without reference weights the invariant enforced here is self-consistency:
any change that alters these tokens must be reviewed as a numerics change).
"""

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.generation import GenerationConfig, greedy_generate
from myriad_tpu.models.llama import LlamaConfig, LlamaForCausalLM

FP32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def _tokens(seed_model: int, seed_input: int, n: int = 12):
    model = LlamaForCausalLM(LlamaConfig.tiny(), **FP32)
    params = model.init_params(jax.random.PRNGKey(seed_model))
    embeds = jnp.asarray(
        np.random.default_rng(seed_input).normal(size=(1, 5, 64)).astype(np.float32)
        * 0.1
    )
    cfg = GenerationConfig(max_new_tokens=n, eos_token_id=-1, stop_single=-1,
                           stop_pair=(-1, -1))
    return greedy_generate(model, params, embeds, config=cfg,
                           cache_dtype=jnp.float32)


def test_golden_greedy_transcript_stability():
    """The same seeds must always produce the same transcript.

    If this fails after an intentional numerics change, re-record the
    golden rows (and treat it as a greedy-parity-affecting change).
    """
    got = np.asarray(_tokens(0, 0))[0].tolist()
    got2 = np.asarray(_tokens(0, 0))[0].tolist()
    assert got == got2  # run-to-run determinism
    golden_path = __file__.replace(".py", "_golden.txt")
    import os

    if not os.path.exists(golden_path):  # first run records
        with open(golden_path, "w") as f:
            f.write(" ".join(map(str, got)))
    with open(golden_path) as f:
        golden = list(map(int, f.read().split()))
    assert got == golden, (
        "greedy transcript changed — numerics-affecting change, review "
        f"required (got {got}, golden {golden})"
    )
