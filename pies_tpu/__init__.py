"""pies_tpu — a TPU-native soft-body physics engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of nithinp7/Pies
(Projective Dynamics + Position-Based Dynamics, constraint library, CCD
collision pipeline, scene-construction API), designed TPU-first: SoA state,
typed padded constraint batches, sort-based uniform-grid broadphase,
matrix-free Jacobi-PCG global solves, and whole-substep compilation into a
single XLA program.  See SURVEY.md for the reference map and FIDELITY.md for
the documented divergences.
"""

from .options import (
    CollisionBudget,
    PhysicsParams,
    SolverName,
    SolverOptions,
    StepConfig,
    make_params,
    split_options,
)
from .state import SolverState, load_state, make_state, save_state
from .topology import Topology

__version__ = "0.1.0"

__all__ = [
    "CollisionBudget",
    "PhysicsParams",
    "SolverName",
    "SolverOptions",
    "SolverState",
    "StepConfig",
    "Topology",
    "load_state",
    "make_params",
    "make_state",
    "save_state",
    "split_options",
]


def __getattr__(name):
    # Lazy import of the host-facing Solver to keep bare-module import light.
    if name == "Solver":
        from .solver.host import Solver

        return Solver
    raise AttributeError(f"module 'pies_tpu' has no attribute {name!r}")
