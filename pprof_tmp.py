import json, os, tempfile, time
from functools import partial
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ultra_tpu_jax"))
import jax, numpy as np
from __graft_entry__ import _exp_settings, _make_synthetic
from ultra_pytorch_tpu.input_layer.feeds import ClickSimulationFeed
from ultra_pytorch_tpu.run.experiment import create_algorithm
from ultra_pytorch_tpu.sim.click_models import click_model_json_numpy

BATCH, LIST, FEAT, CHUNK, N = 256, 10, 136, 25, 16
ds = _make_synthetic(num_queries=4096, list_size=LIST, feature_size=FEAT)
settings = _exp_settings(LIST)
alg = create_algorithm(settings, ds.feature_size, ds.max_label)
dev = ds.to_device()
td = tempfile.mkdtemp(); cm = os.path.join(td, "pbm.json")
json.dump(click_model_json_numpy("pbm", 0.1, 1.0, 4, 1.0), open(cm, "w"))
feed = ClickSimulationFeed(alg, BATCH, f"click_model_json={cm}", dev)
state = alg.init_state(jax.random.PRNGKey(0), ds.feature_size)
rng = jax.random.PRNGKey(1)

def timeit(fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (N * CHUNK) * 1e6

# feed only
@jax.jit
def feed_only(state, rng):
    def body(c, _):
        r = jax.random.split(c, 3)
        b = feed.train_batch(r[1], state)
        return r[0], b["labels"].sum()
    return jax.lax.scan(body, rng, None, length=CHUNK)[1][-1]
print(f"feed only: {timeit(feed_only, state, rng):.1f} us/step")

# train only (fixed batch)
batch = jax.jit(feed.train_batch)(rng, state)
@jax.jit
def train_only(state, rng):
    def body(c, _):
        s, r = c
        r, kt = jax.random.split(r)
        s, m = alg.train_step(s, batch, kt)
        return (s, r), m["loss"]
    return jax.lax.scan(body, (state, rng), None, length=CHUNK)[1][-1]
print(f"train only: {timeit(train_only, state, rng):.1f} us/step")

# full
@jax.jit
def full(state, rng):
    def body(c, _):
        s, r = c
        r, kb, kt = jax.random.split(r, 3)
        b = feed.train_batch(kb, s)
        s, m = alg.train_step(s, b, kt)
        return (s, r), m["loss"]
    return jax.lax.scan(body, (state, rng), None, length=CHUNK)[1][-1]
print(f"full: {timeit(full, state, rng):.1f} us/step")
