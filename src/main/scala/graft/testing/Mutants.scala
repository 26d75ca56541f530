package graft.testing

import java.sql.Timestamp
import scala.util.Random

/** Mutation-testing kit: a mutant perturbs one or more cells of a test
  * input PlainFrame; a healthy test suite must FAIL on every mutant
  * ("kill" it), proving the golden assertion actually constrains the
  * computation (reference: src/pywrangler/util/testing/mutants.py).
  */
sealed trait Mutant {
  /** The cell coordinates this mutant touches (column name, row index). */
  def positions(pf: PlainFrame): Seq[(String, Int)]
  /** Return the mutated frame. */
  def mutate(pf: PlainFrame): PlainFrame
}

/** Set one cell to an explicit value
  * (reference: mutants.py ValueMutant).
  */
final case class ValueMutant(column: String, row: Int, value: Any)
    extends Mutant {
  def positions(pf: PlainFrame): Seq[(String, Int)] = Seq((column, row))
  def mutate(pf: PlainFrame): PlainFrame = pf.withValue(column, row, value)
}

/** Arbitrary frame transformation as a mutant
  * (reference: mutants.py FunctionMutant).
  */
final case class FunctionMutant(f: PlainFrame => PlainFrame,
                                description: String = "function mutant")
    extends Mutant {
  def positions(pf: PlainFrame): Seq[(String, Int)] = Seq.empty
  def mutate(pf: PlainFrame): PlainFrame = f(pf)
}

/** Randomly mutate `count` cells with seeded, dtype-aware random values
  * guaranteed to differ from the original cell
  * (reference: mutants.py RandomMutant, :424-469).
  */
final case class RandomMutant(count: Int = 1, seed: Long = 42L,
                              columns: Seq[String] = Nil)
    extends Mutant {

  private def candidates(pf: PlainFrame): Seq[(String, Int)] = {
    val cols = if (columns.nonEmpty) columns else pf.columnNames
    for (c <- cols; r <- 0 until pf.nRows) yield (c, r)
  }

  def positions(pf: PlainFrame): Seq[(String, Int)] = {
    val rnd = new Random(seed)
    rnd.shuffle(candidates(pf)).take(math.min(count, pf.nRows * pf.columns.size))
  }

  private def randomValue(rnd: Random, t: PFType, old: Any): Any = {
    var v: Any = null
    do {
      v = t match {
        case PFType.Bool     => rnd.nextBoolean()
        case PFType.Int      => rnd.nextInt(1000).toLong
        case PFType.Float    => math.rint(rnd.nextDouble() * 1e6) / 1e3
        case PFType.Str      => "mut_" + rnd.nextInt(100000)
        case PFType.Datetime => new Timestamp(rnd.nextInt(Int.MaxValue).toLong * 1000L)
      }
    } while (v == old)
    v
  }

  def mutate(pf: PlainFrame): PlainFrame = {
    val rnd = new Random(seed)
    positions(pf).foldLeft(pf) { case (acc, (c, r)) =>
      acc.withValue(c, r, randomValue(rnd, acc.column(c).dtype,
        acc.column(c).values(r)))
    }
  }
}

object Mutant {
  /** Expand convenience specs into one mutant per touched cell
    * (reference: mutants.py MutantCollection).
    */
  def forCells(cells: (String, Int, Any)*): Seq[Mutant] =
    cells.map { case (c, r, v) => ValueMutant(c, r, v) }
}
