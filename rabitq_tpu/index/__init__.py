"""Index engines: IVF, brute-force, MSTG, smart loader."""
