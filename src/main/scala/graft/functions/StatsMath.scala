package graft.functions

/** Special functions backing the distributional expectations (chi-square
  * test, parameterized / bootstrapped KS tests, Cramér's φ).
  *
  * Everything here is driver-side scalar math over already-reduced
  * statistics (a value-counts histogram or a sup-distance); the heavy
  * per-row work stays in distributed Spark plans. Algorithms are the
  * standard published ones: Lanczos log-gamma, Numerical-Recipes-style
  * series/continued-fraction regularized incomplete gamma and beta, the
  * Marsaglia–Tsang–Wang matrix algorithm for the exact finite-n
  * Kolmogorov distribution and the classic asymptotic series beyond it.
  *
  * Reference surface being matched:
  * expectations/metrics/column_aggregate_metrics/
  *   column_parameterized_distribution_ks_test_p_value.py:27-44 (scipy
  *   kstest dispatch) and metrics/util.py:1113-1148 (positional-arg
  *   mapping — NOTE scipy's uniform/expon take (loc, scale), so the
  *   reference's `max` is a SCALE, not an upper bound; replicated as-is).
  */
object StatsMath {

  // --- log-gamma (Lanczos, g = 5, 6 coefficients; ~1e-10 relative) --------
  private val lanczos = Array(
    76.18009172947146, -86.50532032941677, 24.01409824083091,
    -1.231739572450155, 0.1208650973866179e-2, -0.5395239384953e-5)

  def lgamma(x: Double): Double = {
    require(x > 0, s"lgamma domain: x=$x")
    val tmp0 = x + 5.5 - (x + 0.5) * math.log(x + 5.5)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { ser += lanczos(j) / (x + 1.0 + j); j += 1 }
    -tmp0 + math.log(2.5066282746310005 * ser / x)
  }

  // --- regularized incomplete gamma P(a,x) / Q(a,x) ------------------------
  private val MaxIter = 500
  private val Eps = 3e-14
  private val FpMin = 1e-300

  /** P(a,x) by series when x < a+1 (converges fast there). */
  private def gammaPSeries(a: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < MaxIter) {
      ap += 1
      del *= x / ap
      sum += del
      if (math.abs(del) < math.abs(sum) * Eps) i = MaxIter
      i += 1
    }
    sum * math.exp(-x + a * math.log(x) - lgamma(a))
  }

  /** Q(a,x) by modified-Lentz continued fraction when x >= a+1. */
  private def gammaQCf(a: Double, x: Double): Double = {
    var b = x + 1.0 - a
    var c = 1.0 / FpMin
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i <= MaxIter && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < FpMin) d = FpMin
      c = b + an / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - lgamma(a)) * h
  }

  def gammaP(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammaP domain: a=$a x=$x")
    if (x == 0) 0.0
    else if (x < a + 1.0) gammaPSeries(a, x)
    else 1.0 - gammaQCf(a, x)
  }

  def gammaQ(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"gammaQ domain: a=$a x=$x")
    if (x == 0) 1.0
    else if (x < a + 1.0) 1.0 - gammaPSeries(a, x)
    else gammaQCf(a, x)
  }

  /** Chi-square survival function: P[X >= x] with df degrees of freedom.
    * x = +∞ (a zero expected frequency drives the statistic there, as in
    * scipy) → p = 0 rather than NaN out of the continued fraction. */
  def chi2Sf(x: Double, df: Double): Double =
    if (x <= 0) 1.0
    else if (x.isInfinity) 0.0
    else gammaQ(df / 2.0, x / 2.0)

  def chi2Cdf(x: Double, df: Double): Double =
    if (x <= 0) 0.0 else gammaP(df / 2.0, x / 2.0)

  // --- erf / normal CDF via the incomplete gamma ---------------------------
  def erf(x: Double): Double =
    if (x >= 0) gammaP(0.5, x * x) else -gammaP(0.5, x * x)

  def erfc(x: Double): Double =
    if (x >= 0) gammaQ(0.5, x * x) else 1.0 + gammaP(0.5, x * x)

  def normCdf(x: Double, mean: Double, std: Double): Double =
    0.5 * erfc(-(x - mean) / (std * math.sqrt(2.0)))

  // --- regularized incomplete beta I_x(a,b) --------------------------------
  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= MaxIter && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }

  def betaInc(a: Double, b: Double, x: Double): Double = {
    require(a > 0 && b > 0, s"betaInc domain: a=$a b=$b")
    if (x <= 0) 0.0
    else if (x >= 1) 1.0
    else {
      val bt = math.exp(lgamma(a + b) - lgamma(a) - lgamma(b) +
        a * math.log(x) + b * math.log1p(-x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betaCf(a, b, x) / a
      else 1.0 - bt * betaCf(b, a, 1.0 - x) / b
    }
  }

  // --- parameterized CDFs (scipy positional-arg semantics) ------------------
  /** CDF of a named scipy distribution with its positional args, exactly as
    * the reference forwards them (metrics/util.py:1135-1148). */
  def cdf(distribution: String, args: IndexedSeq[Double])(x: Double): Double =
    distribution match {
      case "norm" =>
        val (m, s) = (argAt(args, 0, 0.0), argAt(args, 1, 1.0))
        normCdf(x, m, s)
      case "beta" =>
        val a = args(0); val b = args(1)
        val loc = argAt(args, 2, 0.0); val scale = argAt(args, 3, 1.0)
        val z = (x - loc) / scale
        betaInc(a, b, math.max(0.0, math.min(1.0, z)))
      case "gamma" =>
        val a = args(0)
        val loc = argAt(args, 1, 0.0); val scale = argAt(args, 2, 1.0)
        val z = (x - loc) / scale
        if (z <= 0) 0.0 else gammaP(a, z)
      case "chi2" =>
        val df = args(0)
        val loc = argAt(args, 1, 0.0); val scale = argAt(args, 2, 1.0)
        val z = (x - loc) / scale
        if (z <= 0) 0.0 else chi2Cdf(z, df)
      case "uniform" =>
        // scipy uniform(loc, scale): the reference passes (min, max) as
        // positional args, so `max` IS the scale — support [min, min+max]
        val loc = argAt(args, 0, 0.0); val scale = argAt(args, 1, 1.0)
        math.max(0.0, math.min(1.0, (x - loc) / scale))
      case "expon" =>
        val loc = argAt(args, 0, 0.0); val scale = argAt(args, 1, 1.0)
        val z = (x - loc) / scale
        if (z <= 0) 0.0 else -math.expm1(-z)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported distribution '$other' (norm, beta, gamma, chi2, " +
            "uniform, expon)")
    }

  @inline private def argAt(a: IndexedSeq[Double], i: Int, dflt: Double) =
    if (i < a.length) a(i) else dflt

  /** Named-parameter form → positional, mirroring
    * _scipy_distribution_positional_args_from_dict (util.py:1113-1148). */
  def positionalArgs(distribution: String,
      params: Map[String, Double]): IndexedSeq[Double] = {
    val loc = params.getOrElse("loc", 0.0)
    val scale = params.getOrElse("scale", 1.0)
    def need(k: String): Double = params.getOrElse(k,
      throw new IllegalArgumentException(
        s"distribution '$distribution' requires parameter '$k'"))
    distribution match {
      case "norm" => IndexedSeq(need("mean"), need("std_dev"))
      case "beta" => IndexedSeq(need("alpha"), need("beta"), loc, scale)
      case "gamma" => IndexedSeq(need("alpha"), loc, scale)
      case "uniform" => IndexedSeq(need("min"), need("max"))
      case "chi2" => IndexedSeq(need("df"), loc, scale)
      case "expon" => IndexedSeq(loc, scale)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported distribution '$other'")
    }
  }

  // --- Kolmogorov–Smirnov two-sided p-value ---------------------------------
  /** Exact P[D_n >= d] by the Marsaglia–Tsang–Wang matrix-power algorithm
    * ("Evaluating Kolmogorov's Distribution", J. Stat. Software 2003) when
    * the matrix stays small, else the asymptotic Kolmogorov series. The
    * crossover keeps the exact path for every boundary-relevant case (at
    * the p=0.05 frontier n·d ≈ 1.36·√n) while the far tail — where the
    * asymptotic form is already accurate to many digits — avoids an
    * O((n·d)³·log n) matrix blow-up. */
  def ksSf(d: Double, n: Long): Double = {
    if (d <= 0) return 1.0
    if (d >= 1) return 0.0
    val k = math.ceil(n * d).toInt
    if (k <= 140 && n <= 1000000L) 1.0 - ksCdfExact(d, n)
    else ksSfAsymptotic(d, n)
  }

  /** Largest double d with ksSf(d, n) >= p — the per-sample decision
    * `ksSf(d, n) >= p` is exactly `d <= ksCritical(n, p)` because the sf
    * is non-increasing in d. Bisection to adjacent doubles (~60 halvings;
    * 200 is a safe overshoot — extra iterations are no-ops once lo/hi are
    * neighbors). The oracle-checked exact bootstrap compares against this
    * ONE precomputed critical value on both engines instead of evaluating
    * the libm-dependent survival function per sample. */
  def ksCritical(n: Long, p: Double): Double = {
    var lo = 0.0
    var hi = 1.0
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2
      if (ksSf(mid, n) >= p) lo = mid else hi = mid
      i += 1
    }
    lo
  }

  /** Asymptotic two-sided sf: 2 Σ (-1)^{j-1} exp(-2 j² n d²). */
  def ksSfAsymptotic(d: Double, n: Long): Double = {
    val t = n * d * d
    // below t ≈ 0.002 the alternating series needs ≫100 terms, but the
    // dual (Jacobi-theta) form puts the CDF under e^{-600}: sf is 1
    if (t < 0.002) return 1.0
    var sum = 0.0
    var j = 1
    var done = false
    while (j <= 100 && !done) {
      val term = 2.0 * math.exp(-2.0 * j * j * t)
      val signed = if (j % 2 == 1) term else -term
      sum += signed
      if (term < 1e-16) done = true
      j += 1
    }
    math.max(0.0, math.min(1.0, sum))
  }

  /** Exact P[D_n < d] (MTW). m×m matrix power with the published scaling
    * guard against overflow. */
  def ksCdfExact(d: Double, n: Long): Double = {
    val k = math.ceil(n * d).toInt
    val h = k - n * d
    val m = 2 * k - 1
    val big = Array.ofDim[Double](m, m)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        big(i)(j) = if (i - j + 1 < 0) 0.0 else 1.0
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < m) {
      big(i)(0) -= math.pow(h, i + 1)
      big(m - 1)(i) -= math.pow(h, m - i)
      i += 1
    }
    big(m - 1)(0) += (if (2 * h - 1 > 0) math.pow(2 * h - 1, m) else 0.0)
    i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        if (i - j + 1 > 0) {
          var g = 1
          while (g <= i - j + 1) { big(i)(j) /= g; g += 1 }
        }
        j += 1
      }
      i += 1
    }
    // H^n with power-of-two scaling to avoid overflow (track exponent)
    var eH = 0
    var eV = 0
    var v = identity(m)
    var p = big
    var nn = n
    while (nn > 0) {
      if ((nn & 1L) == 1L) {
        v = matMul(v, p)
        eV += eH
        val s = rescale(v)
        eV += s
      }
      p = matMul(p, p)
      eH *= 2
      val s = rescale(p)
      eH += s
      // after squaring, exponent doubles then adds rescale
      nn >>= 1
    }
    var t = v(k - 1)(k - 1)
    var iN = 1L
    var e = eV
    while (iN <= n) {
      t = t * iN / n
      if (t < 1e-140) { t *= 1e140; e -= 140 }
      iN += 1
    }
    val res = t * math.pow(10.0, e)
    math.max(0.0, math.min(1.0, res))
  }

  private def identity(m: Int): Array[Array[Double]] = {
    val a = Array.ofDim[Double](m, m)
    var i = 0
    while (i < m) { a(i)(i) = 1.0; i += 1 }
    a
  }

  private def matMul(a: Array[Array[Double]],
      b: Array[Array[Double]]): Array[Array[Double]] = {
    val m = a.length
    val c = Array.ofDim[Double](m, m)
    var i = 0
    while (i < m) {
      val ai = a(i); val ci = c(i)
      var l = 0
      while (l < m) {
        val v = ai(l)
        if (v != 0.0) {
          val bl = b(l)
          var j = 0
          while (j < m) { ci(j) += v * bl(j); j += 1 }
        }
        l += 1
      }
      i += 1
    }
    c
  }

  /** Rescale by 1e-140 when entries overflow 1e140; returns the power-of-10
    * exponent shift applied (in units of 140). */
  private def rescale(a: Array[Array[Double]]): Int = {
    val m = a.length
    val center = a(m / 2)(m / 2)
    if (center > 1e140) {
      var i = 0
      while (i < m) {
        var j = 0
        while (j < m) { a(i)(j) *= 1e-140; j += 1 }
        i += 1
      }
      140
    } else 0
  }

  // --- chi-square test over aligned observed/expected arrays ----------------
  /** scipy.stats.chisquare semantics: statistic Σ (o-e)²/e, df = k-1,
    * p = chi2Sf(stat, df). */
  def chisquare(observed: Array[Double],
      expected: Array[Double]): (Double, Double) = {
    require(observed.length == expected.length && observed.nonEmpty)
    var stat = 0.0
    var i = 0
    while (i < observed.length) {
      val e = expected(i)
      val o = observed(i)
      val diff = o - e
      stat += diff * diff / e
      i += 1
    }
    val df = observed.length - 1
    (stat, if (df <= 0) 1.0 else chi2Sf(stat, df))
  }
}
