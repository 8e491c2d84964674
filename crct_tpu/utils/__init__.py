"""Host-side utilities: logging, checkpoint IO, eval logs."""

from crct_tpu.utils.logging import init_log_file, log_line
