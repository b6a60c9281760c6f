from stutter_tpu.utils.logging import get_logger, setup_logging
