"""Pure numpy geometry / HMM kernels. No Spark imports allowed here —
these are shared verbatim by the pure-pandas oracle and by the engine's
Arrow-vectorized pandas UDFs, which is what guarantees numeric parity."""
