from naruto_tpu.utils.timer import Timer
from naruto_tpu.utils.printer import InfoPrinter
from naruto_tpu.utils.seeding import fix_random_seed
from naruto_tpu.utils.results import update_results_file

__all__ = ["Timer", "InfoPrinter", "fix_random_seed", "update_results_file"]
