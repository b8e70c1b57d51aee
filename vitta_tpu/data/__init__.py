from vitta_tpu.data.records import VideoRecord, parse_list_file  # noqa: F401
from vitta_tpu.data import sampling  # noqa: F401
