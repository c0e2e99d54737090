from .apply import (  # noqa: F401
    apply_B_dir,
    apply_BT_dir,
    schur_matvec,
    solve_A,
    solve_A_dir,
    weighted_mass,
)
from .context import build_context  # noqa: F401
from .tridiag import tridiag_factor, tridiag_solve  # noqa: F401
