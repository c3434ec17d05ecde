__version__ = '0.1.0'


def parse_version_info(version_str):
    ver = []
    for x in version_str.split('.'):
        ver.append(int(x) if x.isdigit() else x)
    return tuple(ver)


version_info = parse_version_info(__version__)
