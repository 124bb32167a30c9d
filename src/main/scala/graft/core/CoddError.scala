package graft.core

/** Error surface of the engine, mirroring the reference's `Error` enum
  * (reference: core/src/lib.rs:20-33).
  */
sealed abstract class CoddError(msg: String) extends RuntimeException(msg)

object CoddError {

  /** An expression that cannot be evaluated (reference: core/src/lib.rs:22-24,
    * raised for `Full` in core/src/database/evaluate.rs:25-34).
    */
  final case class UnsupportedExpression(name: String, operation: String)
      extends CoddError(s"unsupported expression '$name' for operation '$operation'")

  /** Missing (or type-mismatched) relation/view instance
    * (reference: core/src/lib.rs:26-28; type mismatch surfaces the same way
    * via the failed downcast in core/src/database.rs:213-225).
    */
  final case class InstanceNotFound(name: String)
      extends CoddError(s"instance not found: '$name'")

  /** Relation registered twice (reference: core/src/lib.rs:30-32,
    * core/src/database.rs:189-200).
    */
  final case class InstanceExists(name: String)
      extends CoddError(s"instance already exists: '$name'")
}
