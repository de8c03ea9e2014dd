from tailored_avsr_tpu.utils.config import load_config, override_yaml, security_checks
