"""Pure (driver- and executor-safe) functions: chunking, HTML→text,
string similarity, pattern banks. No Spark imports here — these run
inside Arrow-batched pandas UDFs."""
