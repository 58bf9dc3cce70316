"""Wire servers: PostgreSQL v3 protocol front-end for the engine.

≙ reference `yupana-postgres` (YupanaPostgres.scala, MessageHandler.scala):
any PostgreSQL client (psql, psycopg, JDBC-over-pgwire) can run YupanaQL
against the Spark engine.  The Netty binary protocol and the bespoke JDBC
driver are NOT reproduced — pgwire covers the same "remote SQL over a
socket" surface with a protocol every ecosystem already speaks.
"""

from .pgwire import PgWireServer

__all__ = ["PgWireServer"]
