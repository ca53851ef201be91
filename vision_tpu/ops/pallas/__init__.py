from .flash_attention import flash_attention, pallas_available

__all__ = ["flash_attention", "pallas_available"]
