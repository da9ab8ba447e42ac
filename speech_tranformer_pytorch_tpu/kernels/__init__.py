from .interface import flash_attention
