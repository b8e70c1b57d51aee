from vitta_tpu.utils.meters import AverageMeter  # noqa: F401
from vitta_tpu.utils.logging import get_logger, ResultWriter  # noqa: F401
