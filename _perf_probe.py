import time, numpy as np, jax, jax.numpy as jnp, optax, dataclasses
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from popcorn_tpu.config import ModelConfig, TrainConfig
from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda
from popcorn_tpu.data.normalize import NormStats, normalize_and_assemble, photometric_s2_traced
from popcorn_tpu.nn.popcorn import popcorn_forward
from popcorn_tpu.losses.losses import get_loss

mcfg = ModelConfig(pretrained=True, compute_dtype="bfloat16")
tcfg = TrainConfig()
params, consts = load_popcorn_from_dda(mcfg)
stats = NormStats()
B,H,W = 2,2048,2048
rng = np.random.default_rng(0)
batch = {
    "S2": jax.device_put(rng.uniform(0,4000,(B,H,W,4)).astype(np.float32)),
    "S1": jax.device_put(rng.uniform(-25,0,(B,H,W,2)).astype(np.float32)),
    "admin_mask": jax.device_put(np.ones((B,H,W), np.float32)),
    "census_idx": jax.device_put(np.ones(B, np.float32)),
    "y": jax.device_put(rng.uniform(10,1000,(B,)).astype(np.float32)),
    "photometric": jax.device_put(np.asarray([1.0,1.2,1.0,0.9], np.float32)),
}
key = jax.random.PRNGKey(0)

def loss_fn(p, batch, key):
    sample = {"S2": photometric_s2_traced(batch["S2"], batch["photometric"]), "S1": batch["S1"]}
    inputs = {"input": normalize_and_assemble(sample, stats),
              "admin_mask": batch["admin_mask"], "census_idx": batch["census_idx"]}
    out = popcorn_forward(p, consts, inputs, mcfg, train=True, padding=False,
                          sparse=True, key=key)
    loss, aux = get_loss(out["popcount"], batch["y"], scale_abs_mean=out["scale_abs_mean"],
                         loss=tcfg.loss, lam=tcfg.lam,
                         scale_regularization=tcfg.scale_regularization, tag="weak")
    return loss * tcfg.lam_weak

def t(name, f, *a, n=4):
    r = f(*a); _=float(jnp.sum(jax.tree.leaves(r)[0]))
    t0=time.time()
    for _i in range(n):
        r = f(*a); _=float(jnp.sum(jax.tree.leaves(r)[0]))
    print(f"{name}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)

t("A: loss value (incl builder)", jax.jit(loss_fn), params, batch, key)
t("B: loss grad (incl builder)", jax.jit(jax.grad(loss_fn)), params, batch, key)

opt = optax.chain(optax.clip_by_global_norm(0.01), optax.scale_by_adam(), optax.scale_by_learning_rate(1e-4))
opt_state = opt.init(params)
def stepfn(p, s, batch, key):
    g = jax.grad(loss_fn)(p, batch, key)
    u, s = opt.update(g, s, p)
    return optax.apply_updates(p, u), s
t("C: grad + plain optax chain", jax.jit(stepfn), params, opt_state, batch, key)

from popcorn_tpu.train.state import make_optimizer
opt2 = make_optimizer(tcfg)
s2 = opt2.init(params)
def stepfn2(p, s, batch, key):
    g = jax.grad(loss_fn)(p, batch, key)
    u, s = opt2.update(g, s, p)
    return optax.apply_updates(p, u), s
t("D: grad + inject_hyperparams chain", jax.jit(stepfn2), params, s2, batch, key)
