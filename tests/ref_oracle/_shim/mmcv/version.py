version_info = (1, 3, 9)
__version__ = '1.3.9'
