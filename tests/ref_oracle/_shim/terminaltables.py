class AsciiTable:
    def __init__(self, table_data, title=None):
        self.table_data = table_data
        self.title = title
        self.inner_footing_row_border = False

    @property
    def table(self):
        return '\n'.join(
            ' | '.join(str(c) for c in row) for row in self.table_data)
