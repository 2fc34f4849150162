"""ccv_tpu.nn — the NNC-equivalent neural network layer.

The reference implements Levels 1-5 (command registry, tensors/streams,
concrete graphs + static scheduler, symbolic graphs + allocator + autodiff,
dynamic graph, CNNP model API) in ~60k LoC of C (lib/nnc/). On TPU, JAX/XLA
*is* levels 1-3.5: jit traces the symbolic graph, XLA compiles/allocates/
schedules, autodiff is jax.grad, and the static multi-stream scheduler is
XLA's own scheduler. What this package provides is the user-facing surface
on top:

- ``ops``         the command set (the 70+ cmd families of lib/nnc/cmd/) as
                  plain jittable functions
- ``layers``      the CNNP layer zoo (ccv_cnnp_model_addons.c)
- ``model``       the Keras-like model API: compile/fit/evaluate/backward/
                  apply_gradients (ccv_cnnp_model.c)
- ``optimizers``  SGD/Adam/AdamW/LAMB/RMSProp (ccv_nnc_symbolic_graph_minimize.c)
- ``dataframe``   the columnar input pipeline (ccv_cnnp_dataframe*.c)
- ``tensor_io``   SQLite tensor/model checkpoints (ccv_nnc_tensor_io.c)
- ``palettize``   4-8 bit palette weight quantization (ccv_nnc_palettize.c)
- ``dynamic``     eager tape (ccv_nnc_dynamic_graph.c) — thin: jax is eager
                  by default; the tape records for backward()
- ``moe``         Mixture-of-Experts FFN with expert parallelism (no
                  reference twin — designed fresh for TPU per SURVEY §2.5)
"""

from ccv_tpu.nn import ops, layers, model, optimizers

__all__ = ["ops", "layers", "model", "optimizers"]
