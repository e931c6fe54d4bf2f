from pint_tpu.utils.oracle import Oracle

__all__ = ["Oracle"]
