from sejonggo_tpu.utils.metrics import MetricsLogger, Timer, profile_trace
