package graft.ais

/** Synthetic MSG_IVEF fixture documents (shape per the reference's inline
  * sample, ais_ivefParser.py:233-263): five documents, three track Ids,
  * repeated updates of one track, one ObjectData missing UpdateTime
  * (dropped, matching the reference ctor crash).
  */
object IvefFixtures {
  val docs: Seq[(Int, String)] = Seq(
    0 -> """<MSG_IVEF xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns="http://www.iala-to-be-confirmed.org/XMLSchema/IVEF/0.2.5">
  <Header MsgRefId="{aaaa-0001}" Version="0.2.5" />
  <Body>
    <ObjectDatas>
      <ObjectData>
        <TrackData COG="254.1" Id="20240102200433" Heading="255" ROT="0" SOG="4.47566666671751" SourceName="CoastWatch" UpdateTime="2024-01-02T23:29:47.563Z" TrackStatus="1" Length="136" Width="22">
          <Pos Lat="1.23972166666667" Long="103.94434" />
          <NavStatus Value="0" />
        </TrackData>
        <VesselData Class="1" Id="20240102200433" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:29:47.563Z"><Construction Length="136" Width="22" /><Identifier Callsign="9V7754" IMO="9459632" Name="MAERSK WALLIS" MMSI="563148100" /></VesselData>
        <VoyageData Id="20240102200433" CargoTypeIMO="0" Draught="11.2" DestName="SINGAPORE" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:29:47.563Z" ETA="2024-01-03T06:00:00.000Z" />
      </ObjectData>
    </ObjectDatas>
  </Body>
</MSG_IVEF>""",
    1 -> """<MSG_IVEF xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns="http://www.iala-to-be-confirmed.org/XMLSchema/IVEF/0.2.5">
  <Header MsgRefId="{aaaa-0002}" Version="0.2.5" />
  <Body>
    <ObjectDatas>
      <ObjectData>
        <TrackData COG="10.0" Id="20240102200455" Heading="11" ROT="0" SOG="12.5" SourceName="CoastWatch" UpdateTime="2024-01-02T23:30:02.100Z" TrackStatus="1" >
          <Pos Lat="1.5001" Long="104.0002" />
          <NavStatus Value="5" />
        </TrackData>
        <VesselData Class="2" Id="20240102200455" SourceName="Radar7" SourceType="2" UpdateTime="2024-01-02T23:30:02.100Z" />
        
      </ObjectData>
    </ObjectDatas>
  </Body>
</MSG_IVEF>""",
    2 -> """<MSG_IVEF xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns="http://www.iala-to-be-confirmed.org/XMLSchema/IVEF/0.2.5">
  <Header MsgRefId="{aaaa-0003}" Version="0.2.5" />
  <Body>
    <ObjectDatas>
      <ObjectData>
        <TrackData COG="250.0" Id="20240102200433" Heading="251" ROT="0" SOG="5.1" SourceName="CoastWatch" UpdateTime="2024-01-02T23:31:15.004Z" TrackStatus="1" Length="999" Width="99">
          <Pos Lat="1.2501" Long="103.9601" />
          <NavStatus Value="0" />
        </TrackData>
        <VesselData Class="1" Id="20240102200433" SourceName="CoastWatch2" SourceType="3" UpdateTime="2024-01-02T23:31:15.004Z"><Identifier Callsign="9V7754" IMO="9459632" Name="MAERSK WALLIS II" MMSI="563148100" /></VesselData>
        
      </ObjectData>
    </ObjectDatas>
  </Body>
</MSG_IVEF>""",
    3 -> """<MSG_IVEF xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns="http://www.iala-to-be-confirmed.org/XMLSchema/IVEF/0.2.5">
  <Header MsgRefId="{aaaa-0004}" Version="0.2.5" />
  <Body>
    <ObjectDatas>
      <ObjectData>
        <TrackData COG="90.0" Id="20240102200499" Heading="511" ROT="0" SOG="0.0" SourceName="CoastWatch" UpdateTime="2024-01-02T23:32:00.250Z" TrackStatus="1" >
          <Pos Lat="2.0" Long="102.5" />
          <NavStatus Value="1" />
        </TrackData>
        
        <VoyageData Id="20240102200499" CargoTypeIMO="7" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:32:00.250Z" />
      </ObjectData>
      <ObjectData>
        <TrackData COG="1.0" Id="20240102200500" Heading="2" ROT="0" SOG="3.0" SourceName="X" TrackStatus="1">
          <Pos Lat="1.0" Long="100.0" />
        </TrackData>
      </ObjectData>
    </ObjectDatas>
  </Body>
</MSG_IVEF>""",
    4 -> """<MSG_IVEF xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns="http://www.iala-to-be-confirmed.org/XMLSchema/IVEF/0.2.5">
  <Header MsgRefId="{aaaa-0005}" Version="0.2.5" />
  <Body>
    <ObjectDatas>
      <ObjectData>
        <TrackData COG="245.5" Id="20240102200433" Heading="246" ROT="0" SOG="6.0" SourceName="CoastWatch" UpdateTime="2024-01-02T23:33:40.900Z" TrackStatus="1" STYRIS_CANCEL_FLAG="true" STYRIS_FREE_FLAG="false">
          <Pos Lat="1.2600" Long="103.9700" />
          <NavStatus Value="0" />
        </TrackData>
        <VesselData Class="1" Id="20240102200433" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:33:40.900Z" />
        
      </ObjectData>
    </ObjectDatas>
  </Body>
</MSG_IVEF>""")
}
