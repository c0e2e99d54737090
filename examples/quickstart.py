"""Quick start: 1D 2-group slab, reflective left / vacuum right (README example)."""
import numpy as np
import neutfem._neutfem_eigen as nf
from neutfem._neutfem_eigen import BCType, BoundaryID

solver = nf.NeutFEM(order=0, ng=2,
                    x_breaks=np.linspace(0, 100, 11),
                    y_breaks=np.array([0.0]), z_breaks=np.array([0.0]))
solver.get_D()[:] = 1.5
solver.get_SigR()[:] = 0.02          # removal (absorption + out-scatter)
solver.get_SigS()[1, 0, :] = 0.015   # fast -> thermal downscatter
solver.get_NSF()[0, :] = 0.005
solver.get_NSF()[1, :] = 0.02
solver.get_Chi()[0, :] = 1.0
solver.set_bc(BoundaryID.LEFT_1D, BCType.MIRROR)
solver.set_bc(BoundaryID.RIGHT_1D, BCType.DIRICHLET, 0.0)
solver.BuildMatrices()
keff = solver.SolveKeff()
print(f"k-effective = {keff:.6f}")
print(f"flux shape  = {solver.get_flux().shape}")
