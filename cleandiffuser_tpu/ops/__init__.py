from .film_resblock import PALLAS_AVAILABLE, film_resblock, film_resblock_reference
