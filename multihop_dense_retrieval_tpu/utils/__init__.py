from .text import SimpleTokenizer, para_has_answer
from .meters import AverageMeter
from .docdb import DocDB

__all__ = ["SimpleTokenizer", "para_has_answer", "AverageMeter", "DocDB"]
