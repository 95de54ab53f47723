package graft.queries

/** Placeholder registries — filled in by their milestones (see tasks).
  * Kept as separate objects so each capability family lives in its own
  * file as it lands.
  */
