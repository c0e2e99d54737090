"""Subcritical source-driven system: amplification factor and flux map."""
import numpy as np
import neutfem._neutfem_eigen as nf
from neutfem._neutfem_eigen import BCType, BoundaryID

n = 20
s = nf.NeutFEM(0, 2, np.linspace(0, 100, n + 1), np.linspace(0, 100, n + 1),
               np.array([0.0]))
for bid in (1, 2, 3, 4):
    s.set_bc(bid, BCType.DIRICHLET)
s.get_D()[0], s.get_D()[1] = 1.4, 0.4
s.get_SigR()[0], s.get_SigR()[1] = 0.028, 0.10
s.get_NSF()[0], s.get_NSF()[1] = 0.003, 0.07   # subcritical loading
s.get_Chi()[0] = 1.0
s.get_SigS()[1, 0] = 0.018
s.get_SRC()[0, n // 2, n // 2] = 1.0            # point source, fast group
s.BuildMatrices()
s.set_tol(1e-6, 1e-7, 1e-9, 300)

k = s.SolveKeff()
s.reset_flux()
M = s.SolveSubcritical()
print(f"k-eff = {k:.5f} (subcritical), amplification M = {M:.3f}")
print(f"peak/source-cell flux ratio: "
      f"{s.get_flux()[0].max() / s.get_flux()[0][n//2, n//2]:.3f}")
