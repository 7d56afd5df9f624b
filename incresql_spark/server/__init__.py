"""Network front-ends for the engine.  ``mysql`` speaks enough of the
public MySQL client/server protocol for stock clients to connect and run
queries — the reference's primary entry point (server/src/mysql/mod.rs)."""
