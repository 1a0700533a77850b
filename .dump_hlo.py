import numpy as np, jax, jax.numpy as jnp
from vitef_tpu.models import build_model
from vitef_tpu.optim import build_optimizer, build_scheduler
from vitef_tpu.parallel import init_train_state, make_train_step
BATCH=256
model = build_model({"implementation":"vit","model_name":"base","patch_size":16,
 "image_dim":(3,224,224),"pretrained":False,"finetuning":True,"n_classes":10,
 "compute_dtype":"bfloat16"}, key=jax.random.key(0))
sched = build_scheduler({"scheduler":"cosine","warmup":100}, n_steps=1000)
tx,_ = build_optimizer({"optimizer":"sgd","lr":0.01,"momentum":0.9}, schedule=sched, grad_clip=1.0)
step_fn = make_train_step(model.apply, tx, schedule=sched, base_lr=0.01, donate=False)
state = init_train_state(model.params, tx)
x = jnp.zeros((BATCH,3,224,224), jnp.bfloat16)
y = jnp.zeros((BATCH,), jnp.int32)
lowered = step_fn.lower(state, (x, y))
compiled = lowered.compile()
txt = compiled.as_text()
open("/tmp/train_step_hlo.txt","w").write(txt)
print("HLO written:", len(txt))
