"""Pure numpy/python S2 core: cell ids, coords, regions, coverings.

No Spark imports here — this layer is shipped to executors inside pandas
UDFs and must stay importable standalone.
"""
