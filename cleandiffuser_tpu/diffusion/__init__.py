from .basic import DiffusionModel
from .consistency_model import CMCurriculumLogger, ContinuousConsistencyModel
from .diffusionsde import BaseDiffusionSDE, ContinuousDiffusionSDE, DiscreteDiffusionSDE
from .edm import ContinuousEDM
from .karras_ode import EDMDDIM, VEODE, VPODE, KarrasODE
from .rectifiedflow import ContinuousRectifiedFlow, DiscreteRectifiedFlow
from .vp_solvers import SUPPORTED_SOLVERS

# Legacy-name aliases: the reference's imitation pipelines import DDPM/EDM/
# DDIM/DPMSolver legacy engines (reference cleandiffuser/diffusion/ddpm.py:17,
# edm.py:358; see SURVEY.md §2.2b). The rebuild provides one engine family
# whose solver set covers the union, exposed under the legacy names.
DDPM = DiscreteDiffusionSDE
EDM = ContinuousEDM
# DDIM is the same discrete engine sampled with solver="ddim"
# (reference diffusion/ddim.py:15); DPM-Solver variants are the continuous
# engine's ode_/sde_dpmsolver solver strings (reference dpmsolver.py:92,
# dpmsolver_discrete.py:29).
DDIM = DiscreteDiffusionSDE
DPMSolver = ContinuousDiffusionSDE
DPMSolverDiscrete = DiscreteDiffusionSDE
