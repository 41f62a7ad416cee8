"""Compiler-IR inspection and visualization.

The reference renders TorchScript IR to graphviz (TorchScriptVisualizer,
yolort/relay/ir_visualizer.py:20).  The XLA-native equivalents are the jaxpr
(trace-level IR), StableHLO (portable IR) and the optimized HLO after XLA
passes — this module dumps all three and can emit a graphviz dot of the
jaxpr dataflow.
"""

from __future__ import annotations

from typing import Any, Optional

import jax


def get_jaxpr(fn, *example_args) -> str:
    """Trace-level IR (the analog of TorchScript's graph printout)."""
    return str(jax.make_jaxpr(fn)(*example_args))


def get_stablehlo(fn, *example_args) -> str:
    """Portable serialized-IR text (what AOT export ships)."""
    return jax.jit(fn).lower(*example_args).as_text()


def get_optimized_hlo(fn, *example_args) -> str:
    """Post-XLA-optimization HLO — shows fusion decisions (the analog of
    inspecting the TensorRT engine layers)."""
    return jax.jit(fn).lower(*example_args).compile().as_text()


def cost_analysis(fn, *example_args) -> dict:
    """Compiler FLOPs / bytes-accessed estimate — replaces the reference's
    thop-based profiler (v5/utils/torch_utils.py:101)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return dict(costs) if costs else {}


class JaxprVisualizer:
    """Render a jaxpr's dataflow as graphviz dot (cluster-free, one node per
    equation, labeled by primitive)."""

    def __init__(self, fn, *example_args):
        self.closed = jax.make_jaxpr(fn)(*example_args)

    def to_dot(self, max_nodes: int = 400) -> str:
        jaxpr = self.closed.jaxpr
        lines = ["digraph jaxpr {", "  rankdir=TB;", '  node [shape=box, fontsize=10];']
        var_src = {}
        for i, v in enumerate(jaxpr.invars):
            name = f"in{i}"
            lines.append(f'  {name} [label="input {i}", style=filled, fillcolor=lightblue];')
            var_src[str(v)] = name
        for i, eqn in enumerate(jaxpr.eqns[:max_nodes]):
            name = f"op{i}"
            lines.append(f'  {name} [label="{eqn.primitive.name}"];')
            for inv in eqn.invars:
                src = var_src.get(str(inv))
                if src is not None:
                    lines.append(f"  {src} -> {name};")
            for outv in eqn.outvars:
                var_src[str(outv)] = name
        for i, v in enumerate(jaxpr.outvars):
            name = f"out{i}"
            lines.append(f'  {name} [label="output {i}", style=filled, fillcolor=lightgreen];')
            src = var_src.get(str(v))
            if src is not None:
                lines.append(f"  {src} -> {name};")
        if len(jaxpr.eqns) > max_nodes:
            lines.append(f'  truncated [label="... {len(jaxpr.eqns) - max_nodes} more eqns"];')
        lines.append("}")
        return "\n".join(lines)

    def save(self, path: str, max_nodes: int = 400) -> None:
        with open(path, "w") as f:
            f.write(self.to_dot(max_nodes))
