"""Version info ([R] pyamg/version.py parity)."""

version = "0.1.0"
full_version = version
short_version = version
release = True
