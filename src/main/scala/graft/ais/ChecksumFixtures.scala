package graft.ais

/** Flat per-sentence list (fx, sentence, expectedValid) for the checksum
  * query — golden sentences plus two corrupted variants.
  */
object ChecksumFixtures {
  val sentences: Seq[(Int, String, Boolean)] = Seq(
    (0, "!ABVDM,1,1,7,A,15R9eN001n7DHvT13w0TBSM>00Rm,0*54", true),
    (1, "!ABVDM,1,1,2,B,37likkpOh27M3ud0Veic9as801i@,0*12", true),
    (2, "!ABVDM,1,1,9,A,4055DwivO63307<PsL2H<G700D10,0*62", true),
    (3, "!ABVDM,2,1,9,A,58I3mA82@Es3UKOOGB0l4E9<f1L4hhU>22222217H147I?610K54480CPj3l,0*19", true),
    (4, "!ABVDM,2,2,9,A,PAiH8888880,2*16", true),
    (5, "!ABVDM,1,1,3,A,6>m><PH000clQDB?AA`<P@0P,0*1A", true),
    (6, "!AIVDM,1,1,,A,805GdVh0GjuoMp2?>h0AP@=UdB06EuOwgrBGwnSwe7wvlOwwsAwwnSGmwvh0,0*67", true),
    (7, "!ABVDM,1,1,7,A,90007thcP07@nkR1jMJ@0>h20@S3,0*43", true),
    (8, "!ABVDM,1,1,8,A,ENm>OAt:0W5:W3h9PTVPh1:Wdh@4=lSP1<j4000003v010,4*5F", true),
    (9, "!ABVDM,1,1,1,A,C7tc>Hh05Ao0L20LREAmCwv0P2=1aiQW0=1111111110?1D5310P,0*40", true),
    (10, "!ABVDM,1,1,7,B,B8HsF90009nTJO0;Pb803wjTkP06,0*67", true),
    (11, "!AIVDM,1,1,,A,H7tCijTt00`0000qP=8EPm1pA668,0*49", true),
    (12, "!ABVDM,1,1,6,A,H8HtV6QTF0th@D0000000000000,2*6E", true),
    (13, "!ABVDM,1,1,0,B,6>m>=9D000clQD528=00W<0,2*74", true),
    (14, "!ABVDM,1,1,1,A,6qt6UI8000cl8DnfUbgN;`H,2*79", true),
    (15, "!ABVDM,1,1,5,A,21mg=5Eu1WW@`E01KSH4lc?pSP00,0*5B", true),
    (16, "!ABVDM,1,1,5,A,<FSg0@5GeWO285<<?PG?B<40D5CD,0*0D", true),
    (17, "!ABVDM,1,1,5,A,>02MN7i<59B04=@UHD,2*29", true),
    (18, "!ABVDM,1,1,5,A,?03OwpiGeWO0D6@H38UM:Ih0hUP,4*24", true),
    (19, "!ABVDM,1,1,5,A,@02MN7iGeWO06@1EM:Ih0j07,0*04", true),
    (20, "!ABVDM,1,1,5,A,A02VqLSs7P5o011kTli0E0L0,4*1A", true),
    (21, "!ABVDM,1,1,5,A,K3Q9r=pwFISSl6;L,0*62", true),
    (22, "!ABVDM,1,1,5,A,802MN7h0G@b2B?1431CDPDHD,0*7C", true),
    (23, "!ABVDM,1,1,5,A,6>jQwe80WGQu?``t7l02G:,0*6A", true),
    (24, "!ABVDM,1,1,5,A,6>m><ph000cmQD92@H0<EBd,1*21", true),
    (25, "!ABVDM,1,1,5,A,702R5`hwCsO9,0*73", true),
    (26, "!ABVDM,1,1,7,A,15R9eN001n7DHvT13w0TBSM>00Rm,0*50", false),
    (27, "!ABVDM,1,1,7,A,15R8eN001n7DHvT13w0TBSM>00Rm,0*54", false))
}
