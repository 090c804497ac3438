"""Load an exported StableHLO artifact and execute it — no model code.

The consumer half of CLI `export-hlo` (cli/commands.run_export_hlo): a
serving host compiles the artifact ONCE into the local PJRT client and then
calls it like a function, without weatherconverter_tpu model definitions,
Flax, or the config system on the deployment image. This is the "compile
once, serve anywhere XLA runs" deployment story the torch reference has no
analog of (its serving path re-assembles four nn.Modules from source,
translation.py:100-121).

The exported module's `main` takes the FLATTENED jit arguments in pytree
order (params trees first, then inputs — params are arguments, never baked
constants) and returns the flattened outputs; `load_stablehlo` wraps that in
a callable that does the flatten/unflatten so callers pass the same pytrees
they would pass to the live jit function. Bit-exactness vs the live path is
pinned by tests/test_hlo_runtime.py (fresh-process roundtrip).

Implementation note: PJRT ingestion goes through the jax-internal MLIR
context + `Client.compile_and_load` (jax 0.9 exposes no public "compile this
StableHLO text" entry); the import surface is isolated here so a future
public API lands in one place.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np


def load_stablehlo(
    path_or_text: str,
    *,
    device: Optional[jax.Device] = None,
    out_treedef: Any = None,
) -> Callable:
    """Compile a StableHLO text artifact into the local backend.

    Args:
      path_or_text: path to the `.mlir` file written by `export-hlo`, or the
        module text itself.
      device: target device (default: first local device).
      out_treedef: optional `jax.tree_util.PyTreeDef` to unflatten the
        outputs into; by default the callable returns a flat list (single
        output unwrapped).

    Returns:
      callable taking the same positional pytrees as the exported function
      (e.g. `(unet_params, seg_vars, srgan_vars, input, gt, key)` for the
      translate program) and returning device arrays.
    """
    import os

    from jax._src.interpreters import mlir as _mlir
    from jax._src.lib import xla_client as _xc
    from jax._src.lib.mlir import ir as _ir
    from jaxlib import _jax as _jaxlib

    text = path_or_text
    if "\n" not in path_or_text and os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()

    dev = device if device is not None else jax.devices()[0]
    client = dev.client
    with _mlir.make_ir_context():
        module = _ir.Module.parse(text)
    executable = client.compile_and_load(
        module,
        executable_devices=_jaxlib.DeviceList((dev,)),
        compile_options=_xc.CompileOptions(),
    )

    def call(*args):
        flat, _ = jax.tree_util.tree_flatten(args)
        bufs = [client.buffer_from_pyval(np.asarray(a)) for a in flat]
        outs = executable.execute(bufs)
        if out_treedef is not None:
            return jax.tree_util.tree_unflatten(out_treedef, outs)
        return outs[0] if len(outs) == 1 else list(outs)

    return call
