from tip_tpu.chars.amass import AMASS_CHAR, CharInfo  # noqa: F401
