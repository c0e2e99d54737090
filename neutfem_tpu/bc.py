"""Boundary-condition specification.

The reference's ``BCType`` (wrapper.cpp:100-134) accepts DIRICHLET/NEUMANN/ROBIN/
PERIODIC/MIRROR but only discretizes DIRICHLET (= Marshak vacuum) — everything else is
silently a zero-flux natural condition (``ApplyBoundaryConditions`` is an empty stub,
NeutFEM.cpp:2128-2131; MIRROR does nothing).  Here (documented deviation, SURVEY §7.4):

* DIRICHLET: Marshak vacuum ``phi_b = 2 (J.n)`` — adds ``2 * G_ff`` to the boundary-face
  diagonal of A.  The reference multiplies an extra ``D`` (NeutFEM.cpp:1350 vs the
  derivation comment at :1317-1318 which says it should NOT be there); we implement the
  physical form by default and offer ``marshak_d_factor=True`` for bug-compatibility.
* MIRROR: true reflective condition ``J.n = 0`` — essential constraint, the boundary-face
  DOFs are pinned to zero (the reference's no-op version leaks like a zero-flux surface,
  which would make quarter-core symmetry wrong).
* NEUMANN(value=q): prescribed inward current density q (q=0 == MIRROR).  Nonzero q
  is an inhomogeneous essential condition, lifted as J = J' + J_q with a precomputed
  fixed flux-space source (src_bc) consumed by the fixed-source solves; the
  reference accepts the value and silently ignores it (wrapper.cpp:401-423).
* ROBIN(alpha, beta): general albedo ``alpha*phi + beta*dphi/dn = 0`` =>
  ``phi_b = (beta / (alpha * D)) (J.n)`` — adds ``beta/(alpha D) * G_ff``.
* PERIODIC: true periodic coupling — the per-direction face system becomes cyclic
  tridiagonal, solved exactly via Sherman-Morrison on the LDL^T factors
  (ops/context.py); B/B^T and CMFD wrap around.  Must be set on BOTH ends of the
  direction.  Reference bug-parity (warn + natural) is available with
  ``build_context(..., periodic_natural=True)``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Tuple


class BCKind(enum.IntEnum):
    # Values match the reference BCType declaration order (NeutFEM.hpp:51-57).
    DIRICHLET = 0
    NEUMANN = 1
    MIRROR = 2
    ROBIN = 3
    PERIODIC = 4
    NONE = 99  # unspecified: natural (zero boundary flux), the reference default


@dataclasses.dataclass
class BCSpec:
    """BCs keyed by boundary attribute (mesh.boundary_attribute numbering)."""

    kinds: Dict[int, BCKind] = dataclasses.field(default_factory=dict)
    values: Dict[int, float] = dataclasses.field(default_factory=dict)
    robin_alpha: float = 1.0
    robin_beta: float = 1.0

    def set(self, attr: int, kind: BCKind, value: float = 0.0):
        self.kinds[int(attr)] = BCKind(int(kind))
        self.values[int(attr)] = float(value)

    def kind(self, attr: int) -> BCKind:
        return self.kinds.get(int(attr), BCKind.NONE)

    def value(self, attr: int) -> float:
        return self.values.get(int(attr), 0.0)
