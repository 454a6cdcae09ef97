import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("EVFLOW_CONV_IMPL", "im2col")
os.environ.setdefault("EVFLOW_CONV_DTYPE", "bfloat16")
os.environ.setdefault("EVFLOW_CELL_DTYPE", "bfloat16")
os.environ.setdefault("EVFLOW_REMAT", "convs")
import jax, jax.numpy as jnp, numpy as np
from event_flow_tpu.loss.warping import LossConfig
from event_flow_tpu.train.optim import make_optimizer
from event_flow_tpu.train.step import init_train_state, make_train_step
import __graft_entry__ as ge

res=(128,128); b,t,n = 8,10,1024
model = ge._flagship()
tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
step = make_train_step(model, tx, res, 2, LossConfig(res, 128.0, 0.001, smoothing_mask=True), micro_batch=4)
state = init_train_state(model, tx, jax.random.PRNGKey(0), b, res, 2)
ev = jnp.zeros((b,t,n,4)); valid=jnp.ones((b,t,n)); aug=jnp.zeros((b,3)); reset=jnp.asarray(False)
comp = jax.jit(step).lower(state, ev, valid, aug, reset).compile()
txt = comp.as_text()
open("/tmp/train_step_hlo.txt","w").write(txt)
print("HLO chars:", len(txt))
