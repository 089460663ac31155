"""ILU(0)-preconditioned GMRES on a convection-diffusion problem.

The nonsymmetric counterpart of examples/cg.py: an upwind-discretized
convection-diffusion operator (-eps*lap(u) + b . grad(u)) is far from
symmetric, so CG does not apply; restarted GMRES stalls when convection
dominates (small eps), and ILU(0) — incomplete LU on the matrix's own
sparsity pattern, applied as one forward + one backward triangular solve
per iteration — is the classic rescue. Everything runs through the
library's jitted device-resident paths: the whole GMRES cycle is one
``lax.while_loop`` and the preconditioner is two SpTRSV tile solves
composed inside it (``sblas.solvers.ilu``).

Run:  python examples/convection_ilu.py [nx] [eps]
"""

import sys

import numpy as np

from sblas import solvers
from sblas.formats import CSR


def convection_diffusion(nx: int, eps: float = 0.01) -> CSR:
    """Upwind 5-point stencil for -eps*lap(u) + u_x + u_y on an nx x nx
    grid (Dirichlet). Strongly nonsymmetric for small eps."""
    import scipy.sparse as sp

    n = nx * nx
    h = 1.0 / (nx + 1)
    main = np.full(n, 4 * eps / h**2 + 2 / h)
    west = np.full(n - 1, -eps / h**2 - 1 / h)
    east = np.full(n - 1, -eps / h**2)
    south = np.full(n - nx, -eps / h**2 - 1 / h)
    north = np.full(n - nx, -eps / h**2)
    # no coupling across grid-row boundaries
    edge = np.arange(1, n) % nx == 0
    west[edge] = 0.0
    east[edge] = 0.0
    s = sp.diags([main, west, east, south, north],
                 [0, -1, 1, -nx, nx]).tocsr()
    s.sort_indices()
    return CSR.from_scipy(s).astype(np.float32)


def solve(nx: int = 64, eps: float = 0.01):
    a = convection_diffusion(nx, eps)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(a.shape[0]).astype(np.float32)

    x0, plain = solvers.gmres(a, b, tol=1e-6, maxiter=2000, restart=30)
    x1, pre = solvers.gmres(a, b, tol=1e-6, maxiter=2000, restart=30,
                            M=solvers.ilu(a))
    return a, b, (x0, plain), (x1, pre)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    a, b, (x0, plain), (x1, pre) = solve(nx, eps)
    for tag, x, info in (("gmres", x0, plain), ("ilu0+gmres", x1, pre)):
        err = (np.linalg.norm(a.to_scipy() @ np.asarray(x) - b)
               / np.linalg.norm(b))
        print(f"{tag:>12}: {info['iterations']:5d} matvecs, "
              f"rel_residual {info['rel_residual']:.2e}, "
              f"true rel err {err:.2e}")


if __name__ == "__main__":
    main()
