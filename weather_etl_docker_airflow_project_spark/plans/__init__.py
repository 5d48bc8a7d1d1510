"""Query plans: the declared query surface of the engine.

``registry`` holds the name -> QuerySpec mapping that backs the driver
contract (``__spark_entry__.py``: ``queries()`` / ``oracle_sql()``).
Importing ``catalog`` populates the registry from all plan modules.
"""
