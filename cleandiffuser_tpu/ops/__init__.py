from .dit_block import (
    dit_block_op,
    dit_block_reference,
    fused_dit_block,
    pack_dit_block_params,
    use_pallas_dit,
)
from .film_resblock import PALLAS_AVAILABLE, film_resblock, film_resblock_reference
from .solver_update import fused_solver_update, solver_update_reference
