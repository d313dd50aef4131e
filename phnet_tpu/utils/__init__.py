from .logger import AverageMeter, TextLogger

__all__ = ["AverageMeter", "TextLogger"]
