import jax, jax.numpy as jnp, numpy as np
from emx.ops.sepconv_kernel import fused_sepconv, sepconv_reference

# The real served-graph block configs (bf16 activations, f32 weights —
# the combination the serve build passes; pre-fix this failed remote
# compile with a mixed-dtype dot).
rng = np.random.default_rng(0)
for c_in, c_out in ((16, 64), (64, 64), (128, 64), (80, 128), (128, 128)):
    x = jnp.asarray(rng.random((2, 128, 128, c_in)), jnp.bfloat16)
    dw = jnp.asarray(rng.random((3, 3, 1, c_in)) - 0.5, jnp.float32)
    dwb = jnp.asarray(rng.random((c_in,)) - 0.5, jnp.float32)
    pw = jnp.asarray(rng.random((1, 1, c_in, c_out)) - 0.5, jnp.float32)
    pwb = jnp.asarray(rng.random((c_out,)) - 0.5, jnp.float32)
    try:
        out = fused_sepconv(x, dw, dwb, pw, pwb, rows=32)
        ref = sepconv_reference(x, dw, dwb, pw, pwb)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print("OK", c_in, c_out, "max_abs_err", round(err, 4))
    except Exception as e:
        print("FAIL", c_in, c_out, str(e)[:300].replace("\n", " | "))
